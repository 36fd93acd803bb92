"""Spark-builtin name-collision sweep (VERDICT r10 item 2).

The ``monthname`` bug generalized: the dialect contract says "unknown
functions pass through" (so loud unresolved-function errors guide the
user), but a pass-through CH name that case-insensitively matches a
Spark builtin is SILENTLY CAPTURED by the builtin — and if the
builtin's semantics differ from ClickHouse's, the query returns a
wrong value with no error (Spark 4's ``monthname`` answered 'Mar'
where CH returns 'March'; probe r10i).

This tool enumerates a curated universe of public ClickHouse function
names (https://clickhouse.com/docs/sql-reference — scalar, aggregate,
window; combinator/parameterized forms are handled structurally by the
translator and not listed) and classifies every name:

- ``handled``   the translator rewrites/renames/raises it, or a
                registered SQL-UDF shim implements it (shims shadow
                builtins: Spark resolves temporary functions first)
- ``loud``      passes through with NO Spark builtin of that name —
                unresolved-function error at analysis time (the
                documented contract for unknown names)
- ``collision`` passes through AND a Spark builtin captures it —
                every such name MUST be in the audited allowlist
                below (value semantics checked vs CH docs) or it is
                a latent silent-diff

``tests/test_builtin_collisions.py`` pins the classification against
a live session's ``spark.catalog.listFunctions()`` so a NEW Spark
builtin that captures a previously-loud CH name fails the suite
instead of silently changing query results.

Run: python tools/collision_sweep.py   (~40 s, local session)
Exit 1 iff an unaudited collision exists.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


#: Public ClickHouse function-name universe (docs.clickhouse.com,
#: SQL reference).  Curated by family; case as documented.  Names the
#: translator handles structurally in (params)(args) or combinator
#: form (topK, quantiles…, -If/-Array/-State) appear in their base
#: spelling only where the base name itself is callable.
CH_FUNCTIONS: tuple[str, ...] = (
    # -- arithmetic / math
    "plus", "minus", "multiply", "divide", "intDiv", "intDivOrZero",
    "modulo", "moduloOrZero", "negate", "abs", "gcd", "lcm", "max2",
    "min2", "isNaN", "isFinite", "isInfinite", "ifNotFinite",
    "e", "pi", "exp", "log", "ln", "exp2", "log2", "exp10", "log10",
    "log1p", "sqrt", "cbrt", "erf", "erfc", "lgamma", "tgamma",
    "sin", "cos", "tan", "asin", "acos", "atan", "atan2", "sinh",
    "cosh", "tanh", "asinh", "acosh", "atanh", "pow", "power",
    "sign", "degrees", "radians", "factorial", "hypot",
    # -- rounding
    "floor", "ceil", "ceiling", "round", "roundBankers", "trunc",
    "truncate", "roundToExp2", "roundDuration", "roundAge",
    # -- comparison / conditional / logical
    "equals", "notEquals", "less", "greater", "lessOrEquals",
    "greaterOrEquals", "if", "multiIf", "greatest", "least", "clamp",
    "and", "or", "not", "xor",
    # -- nullable
    "isNull", "isNotNull", "isZeroOrNull", "coalesce", "ifNull",
    "nullIf", "assumeNotNull", "toNullable", "isNullable",
    # -- type conversion (to* family is shimmed; see _SCALAR_SHIMS)
    "toInt8", "toInt16", "toInt32", "toInt64", "toUInt8", "toUInt16",
    "toUInt32", "toUInt64", "toFloat32", "toFloat64", "toDate",
    "toDate32", "toDateTime", "toDateTime64", "toString", "toBool",
    "toFixedString", "toDecimal32", "toDecimal64", "toTypeName",
    "accurateCast", "accurateCastOrNull", "reinterpretAsUInt32",
    "parseDateTimeBestEffort", "parseDateTimeBestEffortOrNull",
    "parseDateTimeBestEffortOrZero", "parseDateTime",
    "parseDateTimeInJodaSyntax", "formatDateTime",
    "formatDateTimeInJodaSyntax",
    # -- dates and times
    "now", "now64", "nowInBlock", "today", "yesterday", "timeSlot",
    "toYear", "toQuarter", "toMonth", "toDayOfYear", "toDayOfMonth",
    "toDayOfWeek", "toHour", "toMinute", "toSecond",
    "toUnixTimestamp", "toStartOfYear", "toStartOfISOYear",
    "toStartOfQuarter", "toStartOfMonth", "toLastDayOfMonth",
    "toMonday", "toStartOfWeek", "toStartOfDay", "toStartOfHour",
    "toStartOfMinute", "toStartOfSecond", "toStartOfFiveMinutes",
    "toStartOfTenMinutes", "toStartOfFifteenMinutes",
    "toStartOfInterval", "toTime", "toISOWeek", "toISOYear",
    "toWeek", "toYearWeek", "age", "dateDiff", "date_diff",
    "timestampDiff", "timestamp_diff", "dateAdd", "date_add",
    "dateSub", "date_sub", "timestampAdd", "timestamp_add",
    "timestampSub", "timestamp_sub", "addYears", "addQuarters",
    "addMonths", "addWeeks", "addDays", "addHours", "addMinutes",
    "addSeconds", "subtractYears", "subtractQuarters",
    "subtractMonths", "subtractWeeks", "subtractDays",
    "subtractHours", "subtractMinutes", "subtractSeconds",
    "toIntervalYear", "toIntervalQuarter", "toIntervalMonth",
    "toIntervalWeek", "toIntervalDay", "toIntervalHour",
    "toIntervalMinute", "toIntervalSecond", "dateTrunc",
    "date_trunc", "dateName", "monthName", "dayName",
    "toYYYYMM", "toYYYYMMDD", "toYYYYMMDDhhmmss",
    "fromUnixTimestamp", "fromUnixTimestamp64Milli",
    "fromUnixTimestamp64Micro", "toUnixTimestamp64Milli",
    "toUnixTimestamp64Micro", "toUnixTimestamp64Nano",
    "toRelativeYearNum", "toRelativeMonthNum", "toRelativeDayNum",
    "toRelativeHourNum", "toRelativeMinuteNum",
    "toRelativeSecondNum", "toTimeZone", "timeZoneOf",
    "makeDate", "makeDate32", "makeDateTime", "makeDateTime64",
    "YEAR", "QUARTER", "MONTH", "WEEK", "DAY", "DAYOFYEAR",
    "DAYOFMONTH", "DAYOFWEEK", "HOUR", "MINUTE", "SECOND",
    # -- strings
    "empty", "notEmpty", "length", "lengthUTF8", "char_length",
    "character_length", "octet_length", "lower", "upper", "lcase",
    "ucase", "lowerUTF8", "upperUTF8", "isValidUTF8",
    "toValidUTF8", "repeat", "space", "reverse", "reverseUTF8",
    "concat", "concatAssumeInjective", "concatWithSeparator",
    "concat_ws", "substring", "substr", "mid", "substringUTF8",
    "substringIndex", "substring_index", "appendTrailingCharIfAbsent",
    "convertCharset", "base64Encode", "base64Decode",
    "tryBase64Decode", "base58Encode", "base58Decode", "endsWith",
    "startsWith", "endsWithUTF8", "startsWithUTF8", "trim",
    "trimLeft", "trimRight", "trimBoth", "ltrim", "rtrim",
    "leftPad", "lpad", "leftPadUTF8", "rightPad", "rpad",
    "rightPadUTF8", "left", "right", "leftUTF8", "rightUTF8",
    "ascii", "format", "translate", "translateUTF8", "initcap",
    "initcapUTF8", "soundex", "char", "CHAR", "chr",
    "firstLine", "normalizeQuery", "normalizedQueryHash",
    "editDistance", "editDistanceUTF8", "levenshteinDistance",
    "levenshteinDistanceUTF8", "stringJaccardIndex",
    "stringJaccardIndexUTF8", "byteHammingDistance",
    "damerauLevenshteinDistance", "jaroSimilarity",
    "jaroWinklerSimilarity", "hasSubsequenceCaseInsensitive",
    "overlay", "overlayUTF8", "byteSwap", "punycodeEncode",
    "punycodeDecode", "idnaEncode", "idnaDecode", "sqidEncode",
    "sqidDecode", "arrayShingles", "seriesDecomposeSTL",
    "seriesOutliersDetectTukey", "seriesPeriodDetectFFT",
    # -- string search / replace / split
    "position", "positionUTF8", "positionCaseInsensitive",
    "positionCaseInsensitiveUTF8", "locate", "multiSearchAny",
    "multiSearchFirstPosition", "multiSearchFirstIndex",
    "multiSearchAllPositions", "match", "multiMatchAny", "like",
    "notLike", "ilike", "notILike", "extract", "extractAll",
    "extractAllGroupsVertical", "extractAllGroupsHorizontal",
    "extractGroups", "countSubstrings",
    "countSubstringsCaseInsensitive", "countMatches",
    "hasSubsequence", "hasToken", "hasTokenOrNull", "ngramDistance",
    "ngramSearch", "replaceOne", "replaceAll", "replace",
    "replaceRegexpOne", "replaceRegexpAll", "regexpExtract",
    "regexpQuoteMeta", "splitByChar", "splitByString",
    "splitByRegexp", "splitByWhitespace", "splitByNonAlpha",
    "arrayStringConcat", "alphaTokens", "tokens", "ngrams",
    # -- arrays
    "array", "arrayConcat", "arrayElement", "has", "hasAll",
    "hasAny", "indexOf", "arrayCount", "countEqual",
    "arrayEnumerate", "arrayEnumerateUniq", "arrayPopBack",
    "arrayPopFront", "arrayPushBack", "arrayPushFront",
    "arrayResize", "arraySlice", "arraySort", "arrayReverseSort",
    "arrayPartialSort", "arrayShuffle", "arrayUniq", "arrayJoin",
    "arrayDifference", "arrayDistinct", "arrayEnumerateDense",
    "arrayIntersect", "arrayReduce", "arrayReduceInRanges",
    "arrayReverse", "arrayFlatten", "arrayCompact", "arrayZip",
    "arrayAUC", "arrayMap", "arrayFilter", "arrayFill",
    "arrayReverseFill", "arraySplit", "arrayReverseSplit",
    "arrayExists", "arrayAll", "arrayFirst", "arrayFirstOrNull",
    "arrayLast", "arrayLastOrNull", "arrayFirstIndex",
    "arrayLastIndex", "arrayMin", "arrayMax", "arraySum",
    "arrayAvg", "arrayCumSum", "arrayCumSumNonNegative",
    "arrayProduct", "arrayStringConcat", "arrayFold",
    "arrayWithConstant", "emptyArrayString", "emptyArrayInt64",
    "emptyArrayFloat64", "range", "arrayRotateLeft",
    "arrayRotateRight", "arrayShiftLeft", "arrayShiftRight",
    "arrayJaccardIndex", "arrayRandomSample",
    # -- maps / tuples
    "map", "mapFromArrays", "mapKeys", "mapValues", "mapContains",
    "mapContainsKey", "mapAdd", "mapSubtract", "mapApply",
    "mapFilter", "mapUpdate", "mapConcat", "mapExists", "mapAll",
    "tuple", "tupleElement", "untuple", "tupleHammingDistance",
    "tuplePlus", "tupleMinus", "tupleMultiply", "tupleDivide",
    "tupleNegate", "tupleToNameValuePairs",
    # -- bit / encoding
    "bitAnd", "bitOr", "bitXor", "bitNot", "bitShiftLeft",
    "bitShiftRight", "bitRotateLeft", "bitRotateRight", "bitTest",
    "bitTestAll", "bitTestAny", "bitCount", "bitSlice",
    "bitHammingDistance", "hex", "unhex", "bin", "unbin",
    "bitmaskToList", "bitmaskToArray", "bitPositionsToArray",
    "mortonEncode", "mortonDecode",
    # -- hash / random / uuid
    "halfMD5", "MD4", "MD5", "SHA1", "SHA224", "SHA256", "SHA512",
    "BLAKE3", "sipHash64", "sipHash128", "cityHash64", "intHash32",
    "intHash64", "xxHash32", "xxHash64", "xxh3", "farmHash64",
    "farmFingerprint64", "metroHash64", "jumpConsistentHash",
    "murmurHash2_32", "murmurHash2_64", "murmurHash3_32",
    "murmurHash3_64", "murmurHash3_128", "gccMurmurHash",
    "javaHash", "javaHashUTF16LE", "hiveHash", "wordShingleSimHash",
    "ngramSimHash", "minSampleSizeConversion", "CRC32", "CRC32IEEE",
    "CRC64", "rand", "rand32", "rand64", "randCanonical",
    "randConstant", "randUniform", "randNormal", "randBernoulli",
    "randomString", "randomPrintableASCII", "randomStringUTF8",
    "randomFixedString", "generateUUIDv4", "generateUUIDv7",
    "UUIDStringToNum", "UUIDNumToString", "toUUID", "serverUUID",
    # -- url / ip / json (shimmed or loud)
    "protocol", "domain", "domainWithoutWWW", "topLevelDomain",
    "firstSignificantSubdomain", "cutToFirstSignificantSubdomain",
    "path", "pathFull", "queryString", "fragment",
    "queryStringAndFragment", "extractURLParameter",
    "extractURLParameters", "extractURLParameterNames",
    "URLHierarchy", "URLPathHierarchy", "decodeURLComponent",
    "encodeURLComponent", "netloc", "cutWWW", "cutQueryString",
    "cutFragment", "cutQueryStringAndFragment", "cutURLParameter",
    "IPv4NumToString", "IPv4StringToNum", "IPv4StringToNumOrNull",
    "IPv6NumToString", "IPv6StringToNum", "toIPv4", "toIPv6",
    "isIPv4String", "isIPv6String", "isIPAddressInRange",
    "JSONHas", "JSONLength", "JSONType", "JSONExtractUInt",
    "JSONExtractInt", "JSONExtractFloat", "JSONExtractBool",
    "JSONExtractString", "JSONExtract", "JSONExtractKeysAndValues",
    "JSONExtractKeys", "JSONExtractRaw", "JSONExtractArrayRaw",
    "JSON_EXISTS", "JSON_QUERY", "JSON_VALUE", "toJSONString",
    "simpleJSONHas", "simpleJSONExtractUInt", "simpleJSONExtractInt",
    "simpleJSONExtractFloat", "simpleJSONExtractBool",
    "simpleJSONExtractString", "simpleJSONExtractRaw",
    "visitParamHas", "visitParamExtractInt", "visitParamExtractBool",
    "visitParamExtractFloat", "visitParamExtractString",
    # -- distance / vector
    "L1Norm", "L2Norm", "L2SquaredNorm", "LinfNorm", "LpNorm",
    "L1Distance", "L2Distance", "L2SquaredDistance", "LinfDistance",
    "LpDistance", "dotProduct", "cosineDistance",
    "L1Normalize", "L2Normalize", "LinfNormalize",
    # -- introspection / other scalar
    "hostName", "getMacro", "FQDN", "basename", "visibleWidth",
    "blockSize", "blockNumber", "rowNumberInBlock",
    "rowNumberInAllBlocks", "ignore", "sleep", "sleepEachRow",
    "currentDatabase", "currentUser", "version", "uptime",
    "buildId", "identity", "materialize", "bar",
    "formatReadableSize", "formatReadableQuantity",
    "formatReadableDecimalSize", "formatReadableTimeDelta",
    "transform", "isConstant", "isDecimalOverflow", "countDigits",
    "tcpPort", "getSetting", "getServerPort", "byteSize",
    "MACNumToString", "MACStringToNum",
    "isZeroOrNull", "throwIf", "defaultValueOfArgumentType",
    "defaultValueOfTypeName", "indexHint", "replicate",
    "filesystemAvailable", "filesystemCapacity", "initialQueryID",
    "queryID", "shardNum", "shardCount", "getOSKernelVersion",
    "widthBucket", "width_bucket", "proportionsZTest",
    # -- encoding misc
    "positiveModulo", "positive_modulo", "pmod",
    # -- aggregates (base spellings; combinators are structural)
    "count", "min", "max", "sum", "avg", "any", "anyLast",
    "anyHeavy", "stddevPop", "stddevSamp", "varPop", "varSamp",
    "covarPop", "covarSamp", "corr", "corrStable", "argMin",
    "argMax", "avgWeighted", "topK", "topKWeighted", "groupArray",
    "groupArrayLast", "groupUniqArray", "groupArrayInsertAt",
    "groupArrayMovingAvg", "groupArrayMovingSum", "groupArraySample",
    "groupBitAnd", "groupBitOr", "groupBitXor", "groupBitmap",
    "sumWithOverflow", "sumMap", "minMap", "maxMap", "avgMap",
    "skewPop", "skewSamp", "kurtPop", "kurtSamp", "uniq",
    "uniqExact", "uniqCombined", "uniqCombined64", "uniqHLL12",
    "uniqTheta", "uniqUpTo", "median", "medianExact",
    "medianExactLow", "medianExactHigh", "medianTiming",
    "medianTDigest", "quantile", "quantiles", "quantileExact",
    "quantileExactLow", "quantileExactHigh", "quantileExactWeighted",
    "quantileTiming", "quantileTimingWeighted", "quantileTDigest",
    "quantileTDigestWeighted", "quantileBFloat16",
    "quantileDeterministic", "quantilesExact", "quantilesTiming",
    "quantilesTDigest", "quantilesDeterministic", "simpleLinearRegression",
    "stochasticLinearRegression", "stochasticLogisticRegression",
    "categoricalInformationValue", "studentTTest", "welchTTest",
    "mannWhitneyUTest", "meanZTest", "entropy", "histogram",
    "sequenceMatch", "sequenceCount", "sequenceNextNode",
    "windowFunnel", "retention", "uniqUpTo", "sumCount",
    "deltaSum", "deltaSumTimestamp", "sparkbar", "intervalLengthSum",
    "maxIntersections", "maxIntersectionsPosition", "boundingRatio",
    "exponentialMovingAverage", "exponentialTimeDecayedAvg",
    "largestTriangleThreeBuckets", "first_value", "last_value",
    "runningDifference", "runningAccumulate", "neighbor",
    "runningConcurrency", "contingency", "cramersV",
    "cramersVBiasCorrected", "theilsU", "analysisOfVariance",
    "quantileGK", "quantilesGK", "flameGraph", "distinctDynamicTypes",
    # -- window
    "row_number", "rank", "dense_rank", "percent_rank", "ntile",
    "lagInFrame", "leadInFrame", "nth_value", "cume_dist",
    "nonNegativeDerivative",
    # -- geo
    "greatCircleDistance", "geoDistance", "greatCircleAngle",
    "pointInPolygon", "geohashEncode", "geohashDecode", "h3ToGeo",
    "geoToH3", "h3kRing",
)


#: Pass-through names a Spark builtin captures where the captured
#: semantics match the public CH contract — AUDITED value-by-value
#: (each entry says why the capture is safe; deviations live in
#: _COLLISION_DEVIATIONS instead).  Keys are CH spellings.
COLLISION_ALLOWLIST: dict[str, str] = {
    # math: IEEE/libm functions, identical definitions both engines
    "abs": "numeric identity both engines",
    "e": "Euler constant, both return 2.718281828459045",
    "pi": "both return 3.141592653589793",
    "exp": "libm exp", "ln": "natural log both engines",
    "log2": "libm log2", "log10": "libm log10", "log1p": "libm log1p",
    "sqrt": "libm sqrt", "cbrt": "libm cbrt",
    "sin": "libm", "cos": "libm", "tan": "libm", "asin": "libm",
    "acos": "libm", "atan": "libm", "atan2": "libm (y, x) both",
    "sinh": "libm", "cosh": "libm", "tanh": "libm", "asinh": "libm",
    "acosh": "libm", "atanh": "libm", "hypot": "libm (x, y) both",
    "pow": "libm pow(x, y)", "power": "alias of pow both engines",
    "degrees": "rad→deg both", "radians": "deg→rad both",
    "factorial": "exact integer factorial; CH caps at 20!, Spark "
                 "BIGINT overflows past 20! loudly under ANSI",
    "sign": "-1/0/1 both (CH Float keeps sign(-0.0)=0 like Spark)",
    "pmod": "CH positiveModulo == Spark pmod (both non-negative)",
    "positive_modulo": "CH alias of positiveModulo == Spark pmod",
    "width_bucket": "same 4-arg histogram-bucket contract",
    "widthBucket": "camelCase alias; Spark resolves case-insensitively"
                   " to the same width_bucket builtin",
    # rounding: value-equal members (round itself DEVIATES — shimmed)
    "floor": "floor(x[, n]) same contract (CH n defaults 0)",
    "ceil": "ceil(x[, n]) same contract",
    "ceiling": "alias of ceil both engines",
    # conditional / null
    "if": "if(cond, a, b) — Spark's builtin; CH numeric-truthy "
          "conditions raise loudly under ANSI (boolean required), "
          "boolean conditions are value-equal",
    "coalesce": "first non-NULL arg, both engines",
    "nullIf": "NULL iff equal, else first arg — identical",
    "isNull": "unary NULL test, identical",
    "isNotNull": "unary NOT NULL test, identical",
    # strings (byte/codepoint-safe members only)
    "lower": "ASCII-safe; CH bare lower is byte-wise but the dialect "
             "maps lowerUTF8→lower too (multi-byte via the rename)",
    "upper": "see lower",
    "repeat": "repeat(s, n) identical",
    "space": "space(n) identical",
    "concat": "NULL-propagating variadic concat both engines; CH "
              "auto-stringifies numbers, Spark ANSI casts implicitly",
    "substring": "1-based (s, pos[, len]); negative pos counts from "
                 "the end on both engines",
    "substr": "alias of substring both engines",
    "ascii": "first-character codepoint both engines",
    "initcap": "word-initial capitalization, same word rule (spaces)",
    "translate": "per-char mapping; equal-length from/to is CH's only"
                 " legal form and matches Spark exactly",
    "ltrim": "strip spaces left (CH 1-arg form == Spark 1-arg)",
    "rtrim": "strip spaces right", "trim": "strip spaces both sides",
    "lpad": "lpad(s, len, pad) truncation + padding identical",
    "rpad": "rpad(s, len, pad) identical",
    "char_length": "CODEPOINT count both engines",
    "character_length": "CODEPOINT count both engines",
    "octet_length": "BYTE count both engines",
    "like": "SQL LIKE with % and _, identical",
    "ilike": "case-insensitive LIKE, identical",
    "locate": "locate(needle, haystack[, start]) — CH ≥24.1 uses the "
              "MySQL argument order, same as Spark (CH <24.1 had "
              "haystack-first; the dialect follows current docs)",
    "substring_index": "MySQL substring_index(s, delim, count), "
                       "identical incl. negative count",
    "substringIndex": "camelCase alias of substring_index",
    "mid": "alias of substring both engines",
    "chr": "single-codepoint string from int, identical",
    "char": "CH char(n…) builds a string from UInt8 BYTES (variadic);"
            " Spark char(n) is single-arg codepoint — 1-arg ASCII "
            "(0-127) values agree; multi-arg raises arity loudly",
    "CHAR": "case alias of char",
    "regexpExtract": "regexp_extract(s, pattern[, idx]) same contract"
                     " (Java regex both; CH uses re2 — common shapes "
                     "agree, exotic syntax differs loudly not silently)",
    "soundex": "4-char Soundex code, same algorithm",
    # dates (value-equal members; DAYOFWEEK deviates — structural)
    "YEAR": "extract year", "QUARTER": "1-4", "MONTH": "1-12",
    "DAY": "day of month", "DAYOFMONTH": "day of month",
    "DAYOFYEAR": "1-366", "HOUR": "0-23", "MINUTE": "0-59",
    "SECOND": "0-59",
    "date_trunc": "date_trunc(unit, ts) — same name, same argument "
                  "order, same unit spellings, same truncation",
    # logical function spellings: boolean args are Kleene 3-valued on "
    # both engines; CH numeric-truthy args raise LOUDLY under Spark "
    # ANSI (probed: and(1,0) → BINARY_OP_WRONG_TYPE), and CH's "
    # variadic and(a,b,c) raises arity — never silent
    "and": "boolean Kleene AND; numeric/variadic raise loudly",
    "or": "boolean Kleene OR; numeric/variadic raise loudly",
    "not": "boolean NOT; numeric raises loudly",
    "log": "1-arg log() is the NATURAL log on both engines (CH has "
           "no 2-arg form; Spark's log(base, x) is unreachable from "
           "CH source)",
    "replace": "CH replace = replaceAll(h, needle, repl) — Spark's "
               "3-arg replace() replaces all occurrences identically "
               "(CH has no 2-arg form)",
    "array": "array(…) constructor, identical",
    "map": "map(k1, v1, …) constructor, identical",
    "reverse": "arrays identical; strings: Spark reverses CODEPOINTS "
               "(≡ CH reverseUTF8).  CH's bare reverse() is BYTE-wise"
               " — its multi-byte output is invalid UTF-8 and not "
               "representable as a Spark string value at all, so the "
               "codepoint semantics are the only faithful mapping "
               "(documented deviation; ASCII is byte-identical)",
    # aggregates
    "count": "row / non-NULL count (0-arg form rewritten to count(*))",
    "min": "min ignoring NULLs", "max": "max ignoring NULLs",
    "sum": "sum ignoring NULLs (CH empty-set 0 vs Spark NULL is the "
           "documented empty-set deviation, probed)",
    "avg": "mean ignoring NULLs",
    "corr": "Pearson correlation, identical",
    "median": "CH median == quantile(0.5); Spark median == exact "
              "interpolated p50 — the SAME honest-analogue contract "
              "as the quantile→percentile mapping (documented)",
    "first_value": "window first value, RESPECT NULLS default both",
    "last_value": "window last value, RESPECT NULLS default both",
    # window
    "row_number": "identical", "rank": "identical",
    "dense_rank": "identical", "percent_rank": "identical",
    "ntile": "identical", "cume_dist": "identical",
    "nth_value": "1-based offset, NULL outside frame, both engines",
    # misc
    "version": "returns the ENGINE's version string by design (the "
               "introspection family is engine-native, like typeof)",
    "pathFull": "no Spark builtin 'pathfull' — shimmed anyway",
    "transform": "CH transform(x, from_arr, to_arr[, default]) vs "
                 "Spark transform(arr, lambda): a CH call passes "
                 "array literals where Spark expects a lambda → loud "
                 "analysis error, never a silent value",
    "CRC32": "CRC-32 (IEEE 802.3 / zlib polynomial) both engines",
}

#: CH names a Spark builtin captures with DIFFERENT semantics.  Every
#: entry here must be neutralized in ch_compat (shim / structural
#: rewrite / named raise) — this dict documents the deviation the
#: sweep found and the fix.  The test asserts none of these reaches
#: the captured builtin.
COLLISION_FIXES: dict[str, str] = {
    "monthName": "Spark 4 monthname() returns 'Mar'; CH returns "
                 "'March' → date_format(…, 'MMMM') rewrite (r10i)",
    "dayName": "same class: Spark 4 dayname() returns 'Fri'; CH "
               "returns 'Friday' → date_format(…, 'EEEE') (r11a)",
    "round": "CH round(Float) is banker's (round-half-to-even), "
             "Decimal is half-away; Spark round() is HALF_UP "
             "everywhere → typeof()-dispatched bround/round, with "
             "dot-literals retyped DOUBLE like CH (r11a)",
    "left": "CH left(s, -n) trims |n| chars from the end; Spark "
            "left(s, -n) returns '' → structural rewrite (r11a)",
    "right": "CH right(s, -n) trims from the start; Spark right "
             "returns '' on negative → structural rewrite (r11a)",
    "greatest": "CH greatest/least return NULL if ANY argument is "
                "NULL; Spark skips NULLs → NULL-propagating wrapper "
                "(r11a, with max2/min2 routed the same way)",
    "least": "see greatest",
    "concat_ws": "CH concatWithSeparator/concat_ws return NULL if "
                 "any argument is NULL; Spark concat_ws SKIPS nulls "
                 "→ NULL-propagating wrapper (r11a, ADVICE r10)",
    "extract": "CH extract(haystack, re) is regex extraction; Spark "
               "extract(field FROM ts) is date-part — comma form "
               "with a literal pattern → regexp_extract (pre-r11); "
               "non-literal pattern now a NAMED raise (r11a); "
               "extract(field FROM x) passes through untouched",
    "rand": "CH rand() is a random UInt32 in [0, 2^32); Spark rand() "
            "is a DOUBLE in [0,1) → structural UInt32-draw rewrite "
            "(pre-r11: CAST(floor(rand() * 2^32) AS BIGINT); rand32 "
            "aliases it, rand64 packs two draws, randCanonical maps "
            "to Spark rand)",
    "trunc": "CH trunc(x[, n]) is NUMERIC truncation toward zero; "
             "Spark trunc(date, fmt) is DATE truncation → floor/ceil "
             "sign-dispatch rewrite, DOUBLE result like CH (r11a)",
    "truncate": "alias of trunc — same rewrite",
    "any": "CH any(x) picks an arbitrary value; Spark any(bool) is "
           "bool_or → call-form any(expr) rewrites to any_value "
           "unless BOTH preceded by a comparison operator AND given "
           "a subquery (the ANSI quantified form) — pre-r11 handler",
    "isNaN": "CH isNaN(NULL) is NULL; Spark isnan(NULL) is false → "
             "NULL-propagating wrapper (r11a)",
    "hex": "CH hex() pads integers to the source type's byte width "
           "('0A' vs Spark 'A') → typeof() dispatch: string/binary "
           "pass (byte-identical), integers raise at RUNTIME (r11a)",
    "unhex": "CH returns String, Spark BINARY → CAST AS STRING "
             "bridge (byte-identical for valid UTF-8) (r11a)",
    "bin": "CH pads to source-type width ('00001010' vs Spark "
           "'1010') → named raise (width unknowable) (r11a)",
    "DAYOFWEEK": "CH DAYOFWEEK = toDayOfWeek: Monday=1…Sunday=7; "
                 "Spark dayofweek: Sunday=1…Saturday=7 → structural "
                 "((dayofweek(x)+5)%7)+1, any case (r11a)",
    "dateAdd": "CH 3-arg (unit, n, ts) vs Spark dateadd(date, days) "
               "— REVERSED argument roles → timestampadd rewrite; "
               "2-arg INTERVAL form → type-preserving +/- (r11a)",
    "date_add": "see dateAdd",
    "date_sub": "see dateAdd (negated)",
    "overlay": "CH overlay (24.x, standard-compat) ALSO accepts "
               "NEGATIVE offsets counted from the end, which Spark's "
               "captured builtin does not → structural rewrite: "
               "positive passes, negative maps to length+offset+1, "
               "offset 0 raises at runtime (r11g review)",
}


def classify(spark) -> dict[str, list[str]]:
    """Classify every universe name against a live session; returns
    {'handled': […], 'loud': […], 'collision-allowed': […],
     'collision-fixed': […], 'UNAUDITED': […]}."""
    from transaq_clickhouse_exporter_spark.queries.ch_compat import (
        TopkFallbackWarning, UnsupportedChSql, translate_ch_sql,
        register_ch_functions, _SCALAR_SHIMS,
    )
    import warnings

    register_ch_functions(spark)
    builtins = {f.name.lower() for f in spark.catalog.listFunctions()}
    shims = {n.lower() for n in _SCALAR_SHIMS}
    out: dict[str, list[str]] = {
        "handled": [], "loud": [], "collision-allowed": [],
        "collision-fixed": [], "UNAUDITED": [], "TRANSLATE-CRASH": [],
    }
    # per-name probe shapes where the generic 2-arg call is not the
    # CH spelling (the dateAdd family's 2-arg non-INTERVAL form is
    # deliberately Spark's own and passes through)
    shapes = {
        "dateAdd": "dateAdd(DAY, 2, c1)",
        "date_add": "date_add(DAY, 2, c1)",
        "dateSub": "dateSub(DAY, 2, c1)",
        "date_sub": "date_sub(DAY, 2, c1)",
        "timestampSub": "timestampSub(DAY, 2, c1)",
        "timestamp_sub": "timestamp_sub(DAY, 2, c1)",
    }
    for name in CH_FUNCTIONS:
        if name.lower() in shims:
            out["handled"].append(name)
            continue
        probe = f"SELECT {shapes.get(name, name + '(c1, c2)')} FROM __t"
        bucket = ("collision-fixed" if name in COLLISION_FIXES
                  else "handled")
        try:
            # call-shape probe: the rewriter dispatches on name(…)
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", TopkFallbackWarning)
                t = translate_ch_sql(probe)
        except UnsupportedChSql:
            out[bucket].append(name)  # named raise IS handling
            continue
        except Exception as e:
            # a non-UnsupportedChSql exception from the TRANSLATOR on
            # a simple call shape is a rewriter bug, not handling —
            # bucket separately so the test fails on it (review r11a)
            out["TRANSLATE-CRASH"].append(f"{name}: {type(e).__name__}:"
                                          f" {str(e)[:80]}")
            continue
        # intercepted = the translator changed the call's text at all
        # (rename, structural rewrite, wrapper); a silent capture
        # requires the call to survive VERBATIM
        if t != probe:
            out[bucket].append(name)
            continue
        if name.lower() not in builtins:
            out["loud"].append(name)
        elif name in COLLISION_ALLOWLIST:
            out["collision-allowed"].append(name)
        elif name in COLLISION_FIXES:
            # documented as needing a fix but still passing through
            out["UNAUDITED"].append(name + "  [listed in FIXES but not neutralized]")
        else:
            out["UNAUDITED"].append(name)
    return out


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("collision-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    report = classify(spark)
    for k in ("handled", "loud", "collision-allowed", "collision-fixed"):
        print(f"{k}: {len(report[k])}")
    bad = False
    if report["TRANSLATE-CRASH"]:
        bad = True
        print("\nTRANSLATE-CRASH (rewriter bug on a simple call "
              "shape, not handling):")
        for n in report["TRANSLATE-CRASH"]:
            print("  -", n)
    if report["UNAUDITED"]:
        bad = True
        print("\nUNAUDITED collisions (Spark builtin captures a CH "
              "name with unreviewed semantics):")
        for n in report["UNAUDITED"]:
            print("  -", n)
    if bad:
        return 1
    print("clean: every pass-through collision is audited")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
