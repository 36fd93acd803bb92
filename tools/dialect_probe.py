"""CH dialect breadth probe (VERDICT r8 item 7): run a corpus of
everyday real-world ClickHouse query shapes — the kind that appear in
public Grafana dashboards, the CH docs' examples, and monitoring
queries — through ``run_ch_sql`` and classify each outcome:

- ``ok-value``     ran AND returned the value ClickHouse documents
- ``ok-run``       ran (no reference value asserted)
- ``clean-raise``  UnsupportedChSql naming the construct (the contract)
- ``loud-error``   a raw Spark parse/analysis error — ugly but LOUD;
                   acceptable per the module contract ("unknown
                   functions pass through"), listed for triage
- ``SILENT-DIFF``  ran but returned a value ClickHouse would not —
                   the only truly bad category; every finding here
                   must become a shim or a documented raise + test

Expected values encode PUBLIC ClickHouse documented semantics
(https://clickhouse.com/docs/sql-reference) — e.g. ``position`` is
1-based (haystack, needle), ``indexOf`` returns 0 on miss.

Run: python tools/dialect_probe.py          (~1 min, local session)
Exit code 1 iff any SILENT-DIFF is found.  Findings from the round-9
run are filed as tests in tests/test_ch_compat_scalars.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transaq_clickhouse_exporter_spark.queries.ch_compat import (  # noqa: E402
    TopkFallbackWarning,
    UnsupportedChSql,
    run_ch_sql,
)

# (sql, expected_row_or_None).  expected is a tuple compared against
# the single result row; None = run-probe only.  Queries over tables
# use the engine's derived views (trades/securities/ev).
CORPUS: list[tuple[str, tuple | None]] = [
    # --- scalar string/array functions, CH-documented values ---
    ("SELECT position('Hello, world!', 'o') AS p", (5,)),
    ("SELECT position('Hello', 'z') AS p", (0,)),
    # CH position() is BYTE-based ('в' starts at byte 7 of 'привет');
    # positionUTF8 is character-based (review r9)
    ("SELECT position('привет', 'в') AS b, positionUTF8('привет', 'в')"
     " AS c", (7, 4)),
    # out-of-range subscript: NULL here (documented deviation — CH
    # yields the element type's default), never an ANSI crash
    ("SELECT splitByChar(',', 'abc')[2] AS s", (None,)),
    ("SELECT locate('o', 'Hello') AS p", None),  # CH22.8+: (needle, hay)
    ("SELECT indexOf([10, 20, 30], 20) AS i", (2,)),
    ("SELECT indexOf([10, 20, 30], 99) AS i", (0,)),
    # NULL elements are normal values in CH's array functions
    # (probe r10i: array_position is null-strict and answered NULL)
    ("SELECT indexOf(['a', NULL], NULL) AS i", (2,)),
    # CH monthName is the FULL name; Spark 4's monthname builtin
    # silently answered the abbreviation (probe r10i)
    ("SELECT monthName(toDate('2024-03-05')) AS m", ("March",)),
    ("SELECT has([1, 2, 3], 2) AS h, has([1, 2, 3], 9) AS h2", (True, False)),
    ("SELECT length('hello') AS l", (5,)),
    # CH length(String) counts BYTES (12 for 6 Cyrillic chars);
    # lengthUTF8 counts code points (review r9b)
    ("SELECT length('привет') AS b, lengthUTF8('привет') AS c", (12, 6)),
    # CH length(Array) = element count, but this bridge maps length to
    # the byte-count form (strings only) — arrays are a DOCUMENTED
    # loud raise (spell size()); run-probe records it as loud-error
    ("SELECT length([1, 2, 3]) AS l", None),
    ("SELECT arrayStringConcat(['a', 'b', 'c'], '-') AS s", ("a-b-c",)),
    ("SELECT splitByChar(',', 'a,b,c') AS s", (["a", "b", "c"],)),
    ("SELECT splitByString('::', 'a::b') AS s", (["a", "b"],)),
    ("SELECT leftPad('7', 3, '0') AS s, rightPad('7', 3, 'x') AS t",
     ("007", "7xx")),
    ("SELECT substring('clickhouse', 6) AS s", ("house",)),
    ("SELECT substring('clickhouse', 1, 5) AS s", ("click",)),
    ("SELECT lower('AB') AS a, upper('ab') AS b", ("ab", "AB")),
    ("SELECT concat('a', 'b', 'c') AS s", ("abc",)),
    ("SELECT reverse('abc') AS s", ("cba",)),
    ("SELECT repeat('ab', 3) AS s", ("ababab",)),
    ("SELECT replaceAll('aba', 'a', 'x') AS s", ("xbx",)),
    ("SELECT replaceOne('aba', 'a', 'x') AS s", ("xba",)),
    ("SELECT trim(BOTH ' ' FROM '  x  ') AS s", ("x",)),
    ("SELECT match('abc123', '^abc') AS m", (True,)),
    ("SELECT extract('abc123def', '\\\\d+') AS s", ("123",)),
    ("SELECT ifNull(NULL, 'd') AS a, nullIf(1, 1) AS b", ("d", None)),
    ("SELECT coalesce(NULL, NULL, 3) AS c", (3,)),
    # --- numbers ---
    ("SELECT intDiv(7, 2) AS d, modulo(7, 3) AS m", (3, 1)),
    ("SELECT plus(1, 2) AS p, minus(5, 3) AS m, multiply(2, 3) AS x,"
     " divide(7, 2) AS d", (3, 2, 6, 3.5)),
    # round(2.5): CH round() is BANKER'S for floats (2, not Spark
    # half-up's 3) — bridged by the r11a typeof dispatch
    ("SELECT abs(-2) AS a, floor(1.7) AS f, ceil(1.2) AS c, round(2.5) AS r",
     (2, 1, 2, 2.0)),
    ("SELECT greatest(1, 2) AS g, least(1, 2) AS l", (2, 1)),
    ("SELECT pow(2, 10) AS p, sqrt(9.0) AS s", (1024.0, 3.0)),
    ("SELECT log(exp(1)) AS l", (1.0,)),  # CH log = natural log
    ("SELECT log2(8) AS a, log10(1000) AS b", (3.0, 3.0)),
    ("SELECT toInt64('42') AS i, toFloat64('1.5') AS f", (42, 1.5)),
    ("SELECT toInt32(3.9) AS i", (3,)),  # CH truncates toward zero
    ("SELECT toUInt32('7') AS u", None),
    ("SELECT toFloat32(1.5) AS f", None),
    # CH integer casts WRAP modulo 2^N (review r9)
    ("SELECT toUInt8(300) AS a, toUInt32(-1) AS b, toInt8(200) AS c",
     (44, 4294967295, -56)),
    # --- conditionals ---
    ("SELECT if(1 > 0, 'y', 'n') AS r", ("y",)),
    ("SELECT multiIf(0, 'a', 1, 'b', 'c') AS r", ("b",)),
    # --- round-9b batch: tuples, bit ops, ranges, formatting ---
    ("SELECT tupleElement(tuple(1, 'a'), 2) AS e", ("a",)),
    ("SELECT bitAnd(5, 3) AS a, bitOr(5, 3) AS o, bitXor(5, 3) AS x,"
     " bitShiftLeft(1, 4) AS s", (1, 7, 6, 16)),
    ("SELECT lowerUTF8('ПРИВЕТ') AS l", ("привет",)),
    ("SELECT range(3) AS r", ([0, 1, 2],)),
    ("SELECT range(2, 5) AS r", ([2, 3, 4],)),
    ("SELECT formatReadableSize(1048576) AS s", ("1.00 MiB",)),
    ("SELECT emptyArrayString() AS a", ([],)),
    ("SELECT any(number) AS a FROM numbers(1)", (0,)),
    # --- dates (fixed literals; tz-free functions only) ---
    ("SELECT toYYYYMM(toDateTime('2024-03-05 10:00:00')) AS m", (202403,)),
    ("SELECT toDayOfWeek(toDate('2024-03-04')) AS d", (1,)),  # Monday=1
    ("SELECT dateDiff('day', toDate('2024-03-01'), toDate('2024-03-05'))"
     " AS d", (4,)),
    ("SELECT formatDateTime(toDateTime('2024-03-05 07:08:09'),"
     " '%Y-%m-%d %H:%M:%S') AS s", ("2024-03-05 07:08:09",)),
    ("SELECT addDays(toDate('2024-02-28'), 2) AS d", None),
    ("SELECT toUnixTimestamp(toDateTime('1970-01-01 00:01:00')) AS u",
     None),  # session-tz dependent; run-probe
    # --- JSON (visitParam/JSONExtract family, very common in logs) ---
    ('SELECT JSONExtractString(\'{"a": "x"}\', \'a\') AS s', ("x",)),
    ('SELECT JSONExtractInt(\'{"a": 7}\', \'a\') AS i', (7,)),
    ('SELECT JSONExtractFloat(\'{"a": 1.5}\', \'a\') AS f', (1.5,)),
    ('SELECT JSONHas(\'{"a": 1}\', \'a\') AS h, JSONHas(\'{"a": 1}\','
     " 'b') AS h2", (True, False)),
    ('SELECT visitParamExtractString(\'{"a": "x"}\', \'a\') AS s', ("x",)),
    # type-strict + crash-free on hostile values (review r9): CH
    # returns '' for a wrong-typed *String and 0 for an uncastable *Int
    ('SELECT JSONExtractString(\'{"a": 1}\', \'a\') AS s,'
     ' JSONExtractInt(\'{"n": "abc"}\', \'n\') AS i', ("", 0)),
    ('SELECT JSONHas(\'{"a": null}\', \'a\') AS h', (True,)),
    # --- aggregates over the engine's views ---
    ("SELECT count() AS c FROM trades", None),
    ("SELECT count(*) AS c FROM trades WHERE price > 0", None),
    ("SELECT sec_code, count() AS c FROM trades GROUP BY sec_code"
     " ORDER BY c DESC, sec_code LIMIT 3", None),
    ("SELECT uniqExact(sec_code) AS u FROM trades", None),
    ("SELECT board, count() AS c FROM trades GROUP BY board WITH TOTALS",
     None),
    # WITH FILL bridged through run_ch_sql (r10): the Grafana
    # gap-free time-series shape; INTERPOLATE stays a clean raise
    ("SELECT toStartOfMinute(time) AS m, sum(quantity) AS q FROM"
     " trades GROUP BY m ORDER BY m WITH FILL STEP 60", None),
    ("SELECT number AS n, count() AS c FROM numbers(3) GROUP BY n"
     " ORDER BY n WITH FILL FROM 0 TO 5", None),
    ("SELECT time, price FROM trades ORDER BY time WITH FILL"
     " INTERPOLATE (price AS price)", None),
    ("SELECT quantile(0.5)(price) AS q FROM trades", None),
    ("SELECT quantiles(0.25, 0.75)(price) AS qs FROM trades", None),
    ("SELECT argMax(sec_code, price) AS m FROM trades", None),
    ("SELECT sumIf(quantity, buy_sell = 'B') AS s FROM trades", None),
    ("SELECT sec_code, groupArray(price) AS g FROM trades"
     " WHERE sec_code = 'SEC001' GROUP BY sec_code", None),
    ("SELECT avg(price) AS a, stddevPop(price) AS s FROM trades", None),
    ("SELECT topK(3)(sec_code) AS t FROM trades", None),
    ("SELECT corr(price, quantity) AS c FROM trades", None),
    # --- grammar bridges ---
    ("SELECT sec_code FROM trades FINAL WHERE board IN ('TQBR', 'FUT')"
     " LIMIT 1", None),
    ("SELECT sec_code FROM trades WHERE board IN ['TQBR', 'FUT'] LIMIT 1",
     None),
    ("SELECT sec_code, price FROM trades ORDER BY sec_code, price DESC"
     " LIMIT 2 BY sec_code LIMIT 6", None),
    ("SELECT sec_code FROM trades PREWHERE price > 0 WHERE quantity > 0"
     " LIMIT 1", None),
    ("SELECT count() AS c FROM trades SETTINGS max_threads = 8", None),
    ("WITH toStartOfDay(time) AS d SELECT d, count() AS c FROM trades"
     " GROUP BY d ORDER BY d LIMIT 2", None),
    ("SELECT arrayJoin([1, 2, 3]) AS x", None),
    ("SELECT x FROM (SELECT [1, 2] AS arr) ARRAY JOIN arr AS x", None),
    ("SELECT number FROM numbers(3)", None),  # table function
    # --- documented clean raises ---
    ("SELECT runningDifference(price) FROM trades", None),
    ("SELECT sumMap([1], [2])", None),
    ("SELECT sec_code FROM trades SAMPLE 0.1", None),
    # --- round-9c batch: hash/random/array/date/URL families ---
    # digests return BYTES like CH; hex() of them is value-exact
    ("SELECT hex(MD5('abc')) AS h",
     ("900150983CD24FB0D6963F7D28E17F72",)),
    ("SELECT hex(SHA256('abc')) AS h",
     ("BA7816BF8F01CFEA414140DE5DAE2223B00361A396177A9CB410FF61F20015AD",)),
    # CH-native hashes raise (Spark xxhash64 = seed 42, CH = seed 0:
    # a bare mapping silently changes which rows a sample selects)
    ("SELECT cityHash64('abc') AS h", None),
    ("SELECT xxHash64('abc') AS h", None),
    ("SELECT sipHash64('abc') AS h", None),
    # CH rand() is a UInt32 draw, NOT [0,1): `rand() % 100 < k`
    # selects ~k% of rows — under the bare Spark mapping it selects
    # 100% (dialect probe, round 9)
    ("SELECT rand() >= 0 AND rand() < 4294967296 AS r", (True,)),
    ("SELECT randCanonical() >= 0 AND randCanonical() < 1 AS r", (True,)),
    ("SELECT randConstant() AS r", None),  # clean-raise
    # array arithmetic: DOUBLE results (documented; CH widens to Int64)
    ("SELECT arraySum([1, 2, 3]) AS s", (6.0,)),
    ("SELECT arraySum(x -> x * 2, [1, 2, 3]) AS s", (12.0,)),
    ("SELECT arrayAvg([1, 2, 3]) AS s", (2.0,)),
    ("SELECT arrayProduct([2, 3, 4]) AS s", (24.0,)),
    ("SELECT arrayCumSum([1, 2, 3]) AS s", ([1.0, 3.0, 6.0],)),
    ("SELECT arrayDifference([1, 3, 6]) AS s", ([0.0, 2.0, 3.0],)),
    ("SELECT arrayFirst(x -> x > 1, [1, 2, 3]) AS s", (2,)),
    ("SELECT arrayLast(x -> x > 1, [1, 2, 3]) AS s", (3,)),
    # no match: NULL here (documented deviation — CH yields the
    # element default), same rule as subscripts
    ("SELECT arrayFirst(x -> x > 9, [1, 2, 3]) AS s", (None,)),
    ("SELECT arrayFirstIndex(x -> x > 1, [1, 2, 3]) AS s", (2,)),
    ("SELECT arrayFirstIndex(x -> x > 9, [1, 2, 3]) AS s", (0,)),
    ("SELECT arrayEnumerate([7, 8, 9]) AS s", ([1, 2, 3],)),
    ("SELECT arrayCompact([1, 1, 2, 2, 1]) AS s", ([1, 2, 1],)),
    ("SELECT arrayPushBack([1, 2], 3) AS s", ([1, 2, 3],)),
    ("SELECT arrayPopFront([1, 2, 3]) AS s", ([2, 3],)),
    ("SELECT arrayIntersect([1, 2, 3], [2, 3, 4], [3]) AS s", ([3],)),
    ("SELECT arrayReduce('sum', [1, 2, 3]) AS s", (6.0,)),
    ("SELECT arraySort(x -> -x, [1, 3, 2]) AS s", ([3, 2, 1],)),
    ("SELECT arrayReverseSort([1, 3, 2]) AS s", ([3, 2, 1],)),
    # arrayZip composes with tupleElement's positional access
    # (ADVICE r9: arrays_zip field names broke .colN) — subscripts
    # are 1-based like CH
    ("SELECT tupleElement(arrayZip([1, 2], ['a', 'b'])[1], 2) AS v",
     ("a",)),
    ("SELECT tupleElement(arrayZip([1, 2], [3, 4], [5, 6])[2], 3) AS v",
     (6,)),
    # range() with an explicit positive step; negative literal step
    # must clean-raise (CH counts down — silent [] was ADVICE r9)
    ("SELECT range(1, 10, 3) AS r", ([1, 4, 7],)),
    ("SELECT range(5, 0, -1) AS r", None),
    ("SELECT arrayMin(x -> -x, [1, 3, 2]) AS s", (-3,)),
    # CH dictionary transform (the 2-arg lambda spelling stays Spark's)
    ("SELECT transform(2, [1, 2, 3], ['a', 'b', 'c'], 'z') AS t", ("b",)),
    ("SELECT transform(9, [1, 2, 3], ['a', 'b', 'c'], 'z') AS t", ("z",)),
    ("SELECT transform(9, [1, 2, 3], [10, 20, 30]) AS t", (9,)),
    # dates
    ("SELECT toMonday(toDate('2024-03-07')) AS d", None),
    ("SELECT toLastDayOfMonth(toDate('2024-02-05')) AS d", None),
    ("SELECT dateTrunc('hour', toDateTime('2024-03-05 10:31:00')) AS t",
     None),
    ("SELECT parseDateTimeBestEffort('05/03/2024 10:00:00') AS t",
     None),  # day-first like CH
    ("SELECT age('month', toDateTime('2024-01-15 10:00:00'),"
     " toDateTime('2024-03-15 09:00:00')) AS a", (1,)),  # complete units
    ("SELECT age('day', toDate('2024-03-01'), toDate('2024-03-05')) AS a",
     (4,)),
    ("SELECT toDateTime64('2024-03-05 10:00:00.123', 3) AS t", None),
    ("SELECT toTimeZone(now(), 'UTC') AS t", None),  # clean-raise
    # misc
    ("SELECT roundBankers(2.5) AS a, roundBankers(3.5) AS b", None),
    ("SELECT toBool('true') AS a, toBool('0') AS b", (True, False)),
    ("SELECT base64Encode('abc') AS a, base64Decode('YWJj') AS b",
     ("YWJj", "abc")),
    ("SELECT toDecimal64('1.50', 2) AS d", None),
    ("SELECT formatReadableQuantity(1234567) AS q", ("1.23 million",)),
    # URL family (crash-free on hostile input; '' like CH on misses)
    ("SELECT domain('https://user@example.com:8080/a?q=1') AS d",
     ("example.com",)),
    ("SELECT domain('example.com/path') AS d", ("example.com",)),
    ("SELECT path('https://ex.com/a/b?q=1') AS p", ("/a/b",)),
    ("SELECT extractURLParameter('http://x.com/?a=1&b=2', 'b') AS e",
     ("2",)),
    ("SELECT extractURLParameter('not a url', 'b') AS e", ("",)),
    ("SELECT cutQueryString('http://x.com/p?a=1#f') AS c",
     ("http://x.com/p#f",)),
    # --- round-9d batch: CH type names in CAST, float classification,
    # misc calendar/string helpers ---
    # CH CamelCase type spellings opt into CH semantics (wrap casts);
    # ANSI spellings (any other casing) pass through untouched
    ("SELECT CAST(300 AS UInt8) AS u, CAST(-1 AS UInt32) AS w",
     (44, 4294967295)),
    ("SELECT CAST(42, 'String') AS s", ("42",)),        # function form
    ("SELECT CAST('42', 'UInt64') AS u", (42,)),
    ("SELECT CAST('x' AS Nullable(String)) AS n", ("x",)),
    ("SELECT CAST([1, 2] AS Array(Int64)) AS a", ([1, 2],)),
    ("SELECT CAST('abc' AS FixedString(5)) AS f", ("abc\x00\x00",)),
    ("SELECT CAST('x' AS STRING) AS ansi", ("x",)),     # ANSI untouched
    ("SELECT accurateCast(200, 'Int32') AS a", (200,)),
    ("SELECT accurateCast(200, 'UInt8') AS a", None),   # clean-raise
    ("SELECT isFinite(1.0) AS a, isInfinite(1.0) AS b, isNaN(1.0) AS c",
     (True, False, False)),
    ("SELECT ifNotFinite(3.0, 42.0) AS x", (3.0,)),
    ("SELECT CAST(toTime(toDateTime('2024-03-05 10:11:12')) AS STRING)"
     " AS t", ("1970-01-02 10:11:12",)),
    ("SELECT CAST(timeSlot(toDateTime('2024-03-05 10:47:00')) AS STRING)"
     " AS s", ("2024-03-05 10:30:00",)),
    ("SELECT countSubstrings('aaaa', 'aa') AS c", (2,)),
    ("SELECT countMatches('a1b22', '[0-9]+') AS c", (2,)),
    ("SELECT mapKeys(map('a', 1)) AS k", (["a"],)),
    ("SELECT CAST(makeDate(2024, 3, 5) AS STRING) AS d", ("2024-03-05",)),
    ("SELECT CAST(fromUnixTimestamp(60) AS STRING) AS t", None),
    ("SELECT fromUnixTimestamp(60, '%Y') AS t", None),  # clean-raise
    ("SELECT anyHeavy(number) AS a FROM numbers(3)", None),
    ("SELECT uniqCombined64(number) AS u FROM numbers(3)", (3,)),
    ("SELECT dictGet('d', 'a', 1) AS d", None),         # clean-raise
    ("SELECT toWeek(toDate('2024-01-04')) AS w", None), # clean-raise
    ("SELECT concatAssumeInjective('a', 'b') AS c", ("ab",)),
    # --- round-9e batch: grouping modifiers, aggregate combinators,
    # array predicates ---
    ("SELECT board, count() AS c FROM trades GROUP BY ALL"
     " ORDER BY c DESC LIMIT 1", None),                 # Spark-native
    ("SELECT board, count() AS c FROM trades"
     " GROUP BY board WITH ROLLUP ORDER BY c LIMIT 2", None),
    ("SELECT uniqExactIf(sec_code, buy_sell = 'B') AS u FROM trades",
     None),
    ("SELECT anyIf(sec_code, sec_code = 'SEC001') AS a FROM trades",
     ("SEC001",)),
    ("SELECT countIf(price, buy_sell = 'B') AS c FROM trades", None),
    ("SELECT avgWeighted(price, quantity) AS a FROM trades", None),
    ("SELECT avgWeighted(price, 0) AS nan_guard FROM trades", None),
    ("SELECT quantileExactLow(0.5)(price) AS q FROM trades", None),
    ("SELECT corrStable(price, quantity) AS c FROM trades", None),
    ("SELECT groupBitAnd(quantity) AS a, groupBitOr(quantity) AS o,"
     " groupBitXor(quantity) AS x FROM trades", None),
    ("SELECT sumDistinct(quantity) AS s, countDistinct(board) AS c"
     " FROM trades", None),
    ("SELECT skewPop(price) AS s, kurtPop(price) AS k FROM trades",
     None),
    ("SELECT hasAll([1, 2, 3], [1, 2]) AS a, hasAll([1, 2], [1, 9]) AS b",
     (True, False)),
    ("SELECT hasAny([1, 2, 3], [9, 2]) AS a", (True,)),
    ("SELECT countEqual([1, 2, 2, 3], 2) AS c", (2,)),
    ("SELECT hasSubstr([1, 2, 3], [2, 3]) AS h", None),  # clean-raise
    ("SELECT entropy(board) AS e FROM trades", None),    # clean-raise
    ("SELECT sumState(quantity) FROM trades", None),     # clean-raise
    ("SELECT uniqMerge(x) FROM agg", None),              # clean-raise
    # --- round-9f batch: join multiplicity, search/regex, epoch64 ---
    # ANY JOIN keeps ONE right row per key; ALL is the noise default
    ("SELECT count() AS c FROM trades t ANY LEFT JOIN trades_dup d"
     " USING (sec_code)", None),
    ("SELECT count() AS c FROM trades t ALL INNER JOIN securities s"
     " ON t.sec_code = s.seccode", None),
    ("SELECT count() AS c FROM trades t ANY LEFT JOIN securities s"
     " ON t.sec_code = s.seccode", None),                # clean-raise
    ("SELECT extractAll('a1b22c333', '[0-9]+') AS e",
     (["1", "22", "333"],)),
    ("SELECT extractAll('k=1;k=2', 'k=([0-9])') AS e", (["1", "2"],)),
    ("SELECT multiSearchAny('hello world', ['foo', 'wor']) AS m,"
     " multiSearchAny('hello', ['foo']) AS m2", (True, False)),
    ("SELECT splitByRegexp('[0-9]+', 'a1b22c') AS s", (["a", "b", "c"],)),
    ("SELECT bitTest(5, 0) AS a, bitTest(5, 1) AS b", (1, 0)),
    ("SELECT exp2(10) AS a, exp10(3) AS b, intExp2(10) AS c",
     (1024.0, 1000.0, 1024)),
    ("SELECT clamp(15, 0, 10) AS a, clamp(-5, 0, 10) AS b",
     (10.0, 0.0)),
    ("SELECT toUnixTimestamp64Milli(toDateTime64("
     "'2024-03-05 10:00:00.123', 3)) IS NOT NULL AS m", (True,)),
    ("SELECT CAST(fromUnixTimestamp64Milli(60123) AS STRING) AS t",
     ("1970-01-01 00:01:00.123",)),
    ("SELECT now64() <= now() AS n", (True,)),
    ("SELECT like('hello', 'he%') AS l, notLike('hello', 'xx%') AS nl,"
     " ilike('HELLO', 'he%') AS il", (True, True, True)),
    ("SELECT toYYYYMMDDhhmmss(toDateTime('2024-03-05 10:11:12')) AS y",
     (20240305101112,)),
    ("SELECT CAST(toDate32('2024-03-05') AS STRING) AS d",
     ("2024-03-05",)),
    ("SELECT replaceRegexpOne('a1a2', '[0-9]', 'X') AS r", None),  # raise
    # --- round-10 batch: join/subquery corners (VERDICT r9 item 5) --
    # deterministic value checks ride numbers(): left keys 0..9, a
    # 3-key right side {0,1,2} with 3 duplicate rows per key
    # ANY JOIN with alias-qualified USING keys, both alias spellings
    ("SELECT count() AS c FROM numbers(10) AS a ANY LEFT JOIN (SELECT"
     " number % 3 AS number, number AS v FROM numbers(9)) AS b"
     " USING (number)", (10,)),
    ("SELECT count() AS c FROM numbers(10) a ANY INNER JOIN (SELECT"
     " number % 3 AS number FROM numbers(9)) b USING (number)", (3,)),
    # ALL multiplicity twin: 3 matched keys x 3 dup rows + 7 unmatched
    ("SELECT count() AS c FROM numbers(10) AS a ALL LEFT JOIN (SELECT"
     " number % 3 AS number FROM numbers(9)) AS b USING (number)",
     (16,)),
    # two-key USING
    ("SELECT count() AS c FROM (SELECT number, number % 2 AS p FROM"
     " numbers(6)) AS a INNER JOIN (SELECT number, number % 2 AS p"
     " FROM numbers(4)) AS b USING (number, p)", (4,)),
    # CTE + USING interaction (CH WITH name AS (subquery) form)
    ("WITH dim AS (SELECT number, number * 2 AS d FROM numbers(5))"
     " SELECT count() AS c FROM numbers(10) AS a INNER JOIN dim"
     " USING (number)", (5,)),
    ("WITH dim AS (SELECT number % 3 AS number FROM numbers(9))"
     " SELECT count() AS c FROM numbers(10) AS a ANY LEFT JOIN dim"
     " USING (number)", (10,)),
    # CH scalar-WITH + join in one query
    ("WITH 3 AS k SELECT count() AS c FROM numbers(10) AS a INNER"
     " JOIN (SELECT number FROM numbers(5)) AS b USING (number)"
     " WHERE a.number < k", (3,)),
    # semi/anti joins (CH and Spark share the spelling)
    ("SELECT count() AS c FROM numbers(10) AS a LEFT SEMI JOIN (SELECT"
     " number % 3 AS number FROM numbers(9)) AS b USING (number)",
     (3,)),
    ("SELECT count() AS c FROM numbers(10) AS a LEFT ANTI JOIN (SELECT"
     " number % 3 AS number FROM numbers(9)) AS b USING (number)",
     (7,)),
    # cross join, both spellings
    ("SELECT count() AS c FROM numbers(4) AS a CROSS JOIN numbers(3)"
     " AS b", (12,)),
    ("SELECT a.x + b.y AS s FROM (SELECT 1 AS x) AS a, (SELECT 2 AS y)"
     " AS b", (3,)),
    # GLOBAL hints strip (CH distributed-subquery keyword)
    ("SELECT count() AS c FROM numbers(10) AS a GLOBAL ANY LEFT JOIN"
     " (SELECT number % 3 AS number FROM numbers(9)) AS b"
     " USING (number)", (10,)),
    ("SELECT count() AS c FROM numbers(10) WHERE number GLOBAL IN"
     " (SELECT number FROM numbers(3))", (3,)),
    # IN / NOT IN subqueries, incl. the empty-set edge
    ("SELECT count() AS c FROM numbers(10) WHERE number IN (SELECT"
     " number FROM numbers(3))", (3,)),
    ("SELECT count() AS c FROM numbers(10) WHERE number NOT IN (SELECT"
     " number FROM numbers(3))", (7,)),
    ("SELECT count() AS c FROM numbers(3) WHERE number NOT IN (SELECT"
     " number FROM numbers(10) WHERE number > 90)", (3,)),
    # tuple IN literals and tuple IN subquery
    ("SELECT count() AS c FROM numbers(10) WHERE (number, number + 1)"
     " IN ((1, 2), (5, 9))", (1,)),
    ("SELECT count() AS c FROM (SELECT number, number % 2 AS p FROM"
     " numbers(6)) WHERE (number, p) IN (SELECT number, number % 2"
     " AS p FROM numbers(4))", (4,)),
    # correlated IN / EXISTS (CH rejects correlation pre-24.x; running
    # them is superset behavior — run-probe only, never a value claim)
    ("SELECT count() AS c FROM trades WHERE sec_code IN (SELECT"
     " seccode FROM securities WHERE board = trades.board)", None),
    ("SELECT count() AS c FROM numbers(3) WHERE EXISTS (SELECT 1 FROM"
     " numbers(1))", (3,)),
    # scalar subqueries in SELECT and WHERE
    ("SELECT (SELECT max(number) FROM numbers(3)) AS m", (2,)),
    ("SELECT count() AS c FROM numbers(10) WHERE number < (SELECT"
     " avg(number) FROM numbers(10))", (5,)),
    # nested FROM subqueries
    ("SELECT count() AS c FROM (SELECT * FROM (SELECT number FROM"
     " numbers(5)) WHERE number > 1)", (3,)),
    # UNION forms re-aggregated
    ("SELECT count() AS c FROM (SELECT number FROM numbers(3) UNION"
     " ALL SELECT number FROM numbers(3))", (6,)),
    ("SELECT count() AS c FROM (SELECT number FROM numbers(3) UNION"
     " DISTINCT SELECT number FROM numbers(5))", (5,)),
    # LIMIT BY (CH top-n-per-group clause) + PREWHERE + FINAL riders
    ("SELECT count() AS c FROM (SELECT number % 3 AS g, number FROM"
     " numbers(9) ORDER BY g, number LIMIT 2 BY g)", (6,)),
    ("SELECT count() AS c FROM trades PREWHERE price > 0", None),
    ("SELECT count() AS c FROM quotes_dup FINAL", None),
    # ON-form equi-join with an expression key
    ("SELECT count() AS c FROM numbers(5) AS a INNER JOIN numbers(5)"
     " AS b ON a.number = b.number + 1", (4,)),
    # --- round-10b batch: window lag/lead, -Array combinators,
    # divide() zero semantics ---
    # CH has no plain lag/lead; lagInFrame over the full frame IS the
    # CH idiom — bridged to lag/lead with the frame stripped
    ("SELECT sum(l) AS s FROM (SELECT lagInFrame(number) OVER (ORDER"
     " BY number ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED"
     " FOLLOWING) AS l FROM numbers(4))", (3,)),
    ("SELECT sum(l) AS s FROM (SELECT leadInFrame(number, 1, 99) OVER"
     " (ORDER BY number ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED"
     " FOLLOWING) AS l FROM numbers(3))", (102,)),
    # frameless lagInFrame equals lag under CH's default frame;
    # frameless leadInFrame does NOT and clean-raises
    ("SELECT sum(l) AS s FROM (SELECT lagInFrame(number) OVER (ORDER"
     " BY number) AS l FROM numbers(4))", (3,)),
    ("SELECT leadInFrame(number) OVER (ORDER BY number) AS l FROM"
     " numbers(3)", None),
    # divide(): CH float division, inf/nan on zero divisors (Spark's
    # ANSI `/` raises — the named function carries CH semantics)
    ("SELECT divide(7, 2) AS d", (3.5,)),
    ("SELECT isInfinite(divide(1, 0)) AS a, isNaN(divide(0, 0)) AS b,"
     " divide(-1, 0) < 0 AS c", (True, True, True)),
    # -Array combinators decompose to plain aggregates (no explode)
    ("SELECT sumArray(a) AS s, countArray(a) AS c, avgArray(a) AS av,"
     " minArray(a) AS mn, maxArray(a) AS mx FROM (SELECT"
     " [number, number + 10] AS a FROM numbers(3))",
     (36.0, 6, 6.0, 0, 12)),
    ("SELECT arraySort(x -> x, groupArrayArray(a)) AS g FROM (SELECT"
     " [number] AS a FROM numbers(3))", ([0, 1, 2],)),
    ("SELECT divide(NULL, 0) IS NULL AS n", (True,)),
    ("SELECT countArray(a) AS c, sumArray(a) AS s FROM (SELECT"
     " [number] AS a FROM numbers(3) WHERE number > 90)", (0, 0.0)),
    ("SELECT sum(l) AS s FROM (SELECT lagInFrame(number) OVER (ORDER"
     " BY number ROWS UNBOUNDED PRECEDING) AS l FROM numbers(4))",
     (3,)),
    ("SELECT uniqArray(a) FROM t", None),  # clean-raise
    ("SELECT bar(5, 0, 10, 10) AS b", None),  # clean-raise
    # --- round-10h batch: vector-distance family (the expression
    # form of the embedding-search surface datapipe/similarity.py
    # implements at scale) ---
    ("SELECT dotProduct([1, 2, 3], [4, 5, 6]) AS d", (32.0,)),
    ("SELECT L1Distance([1, 2], [4, 6]) AS a, L2Distance([3, 0],"
     " [0, 4]) AS b, LinfDistance([1, 2], [4, 6]) AS c",
     (7.0, 5.0, 4.0)),
    ("SELECT cosineDistance([1, 0], [0, 1]) AS d", (1.0,)),
    ("SELECT L1Norm([1, -2, 3]) AS a, L2Norm([3, 4]) AS b,"
     " LinfNorm([1, -7, 3]) AS c", (6.0, 5.0, 7.0)),
    # over the real embeddings table: nearest-neighbor ORDER BY shape
    # NN idiom: the scalar-subquery argument raises (Spark forbids
    # subqueries in HOFs); the CROSS JOIN hoist is the working shape
    ("SELECT vec_id FROM embeddings ORDER BY cosineDistance(embedding,"
     " (SELECT embedding FROM embeddings WHERE vec_id = 1)) LIMIT 3",
     None),  # clean-raise
    ("SELECT e.vec_id FROM embeddings e CROSS JOIN (SELECT embedding"
     " AS q FROM embeddings WHERE vec_id = 1) qt ORDER BY"
     " cosineDistance(e.embedding, qt.q), e.vec_id LIMIT 3", None),
    # --- round-10g batch: DISTINCT ON, map fns, diff aliases ---
    # DISTINCT ON (cols) == LIMIT 1 BY cols (the CH-documented
    # equivalence); rides the row_number rewrite + its ORDER BY rule
    ("SELECT count() AS c FROM (SELECT DISTINCT ON (g) g, v FROM"
     " (SELECT number % 3 AS g, number AS v FROM numbers(9))"
     " ORDER BY g, v)", (3,)),
    ("SELECT sum(v) AS s FROM (SELECT DISTINCT ON (g) g, v FROM"
     " (SELECT number % 3 AS g, number AS v FROM numbers(9))"
     " ORDER BY g, v DESC)", (21,)),
    ("SELECT mapContains(map('a', 1), 'a') AS c,"
     " mapContains(map('a', 1), 'z') AS d", (True, False)),
    ("SELECT mapFromArrays(['a'], [1])['a'] AS v", (1,)),
    ("SELECT timestamp_diff(DAY, toDate('2024-01-01'),"
     " toDate('2024-01-05')) AS d", (4,)),
    ("SELECT date_diff('day', toDate('2024-01-01'),"
     " toDate('2024-01-05')) AS d", (4,)),
    ("SELECT tupleElement(sumCount(number), 1) AS s,"
     " tupleElement(sumCount(number), 2) AS c FROM numbers(5)",
     (10, 5)),
    ("SELECT number FROM numbers(3) ORDER BY number COLLATE 'en'",
     None),  # clean-raise (stripping would change string order)
    ("SELECT untuple(tuple(1, 2)) AS u", None),  # clean-raise
    # --- round-10f batch: SELECT-star modifiers + finite guards ---
    # replaced columns move to the END (documented position deviation)
    ("SELECT * REPLACE (number * 10 AS number) FROM numbers(2)",
     None),
    ("SELECT count() AS c FROM (SELECT * EXCEPT (v) REPLACE (g + 1"
     " AS g) FROM (SELECT number % 3 AS g, number AS v FROM"
     " numbers(9)))", (9,)),
    # multiplication by the string function stays untouched
    ("SELECT 2 * length(replace('aba', 'b', 'c')) AS m", (6,)),
    ("SELECT * APPLY (max) FROM trades", None),     # clean-raise
    ("SELECT COLUMNS('sec') FROM trades", None),    # clean-raise
    ("SELECT ifNotFinite(divide(1, 0), 99) AS a, ifNotFinite(2.5, 9)"
     " AS b", (99.0, 2.5)),
    ("SELECT isZeroOrNull(0) AS a, isZeroOrNull(NULL) AS b,"
     " isZeroOrNull(5) AS c", (True, True, False)),
    ("SELECT format('it''s {}', 'x') AS f", ("it's x",)),
    ("SELECT format('100%') AS f", ("100%",)),
    # --- round-10e batch: format(), everyday renames, intervals ---
    ("SELECT format('{}-{}', 'a', 'b') AS f", ("a-b",)),
    ("SELECT format('{1} {0}', 'a', 'b') AS f", ("b a",)),
    ("SELECT format('x{{y}} 100% {}', 1) AS f", ("x{y} 100% 1",)),
    ("SELECT format('{}', NULL) IS NULL AS n", (True,)),  # CH NULLs
    ("SELECT concatWithSeparator('-', 'a', 'b') AS c", ("a-b",)),
    ("SELECT max2(1, 2) AS a, min2(3, 2) AS b", (2, 2)),
    ("SELECT sign(-5) AS s, sign(0) AS z", (-1, 0)),  # Int8 in CH
    ("SELECT materialize(5) AS m, identity(7) AS i, toNullable(1)"
     " AS n", (5, 7, 1)),
    ("SELECT CAST(toIntervalMonth(2) + toDate('2024-01-01') AS STRING)"
     " AS d", ("2024-03-01",)),
    ("SELECT CAST(toDateTime('2024-01-01 00:00:00') +"
     " toIntervalMinute(90) AS STRING) AS d", ("2024-01-01 01:30:00",)),
    ("SELECT sleep(1) AS s", None),  # clean-raise
    # --- round-10d batch: text tokenization + array fold/resize ---
    ("SELECT tokens('Hello, world! 42') AS t", (["Hello", "world", "42"],)),
    # non-ASCII stays inside tokens (CH: separators are
    # non-alphanumeric ASCII only)
    ("SELECT tokens('a_b c') AS t", (["a", "b", "c"],)),
    ("SELECT splitByWhitespace('a  b c') AS s", (["a", "b", "c"],)),
    ("SELECT ngrams('abcd', 2) AS n", (["ab", "bc", "cd"],)),
    ("SELECT ngrams('a', 3) AS n", ([],)),
    ("SELECT arrayFold((acc, x) -> acc + x, [1, 2, 3],"
     " CAST(100 AS Int64)) AS a", (106,)),
    ("SELECT arrayCount([0, 1, 0, 2]) AS a", (2,)),
    ("SELECT arrayResize([1, 2], 4, 0) AS r", ([1, 2, 0, 0],)),
    ("SELECT arrayResize([1, 2, 3], 2, 0) AS r", ([1, 2],)),
    ("SELECT arrayResize([1, 2], 4) AS r", None),  # clean-raise
    # join_use_nulls: =1 matches this bridge's (SQL-standard NULL)
    # semantics and strips; CH's default =0 (type-default fill for
    # non-matched outer-join columns) is a documented clean raise
    ("SELECT count(b.number) AS c FROM numbers(3) AS a LEFT JOIN"
     " (SELECT number FROM numbers(1)) AS b USING (number)"
     " SETTINGS join_use_nulls = 1", (1,)),
    ("SELECT 1 FROM a LEFT JOIN b USING (k) SETTINGS"
     " join_use_nulls = 0", None),  # clean-raise
    # ANSI window functions CH shares verbatim — parity values
    ("SELECT sum(t) AS s FROM (SELECT ntile(2) OVER (ORDER BY number)"
     " AS t FROM numbers(4))", (6,)),
    ("SELECT max(r) AS m FROM (SELECT dense_rank() OVER (ORDER BY"
     " number % 2) AS r FROM numbers(4))", (2,)),
    ("SELECT first_value(number) OVER (ORDER BY number DESC ROWS"
     " BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS f"
     " FROM numbers(3) LIMIT 1", (2,)),
    ("SELECT count() AS c FROM (SELECT number, rank() OVER (ORDER BY"
     " number % 2) AS r FROM numbers(4)) WHERE r = 1", (2,)),
    # review-r10 pins: tuple() IN spellings, function-call left sides
    # stay scalar IN, scalar WITH + LIMIT BY nested in subqueries
    ("SELECT count() AS c FROM numbers(10) WHERE tuple(number,"
     " number + 1) IN ((1, 2), (5, 6))", (2,)),
    ("SELECT count() AS c FROM numbers(10) WHERE (number, number + 1)"
     " IN (tuple(1, 2), tuple(5, 6))", (2,)),
    ("SELECT count() AS c FROM numbers(10) WHERE greatest(number, 3)"
     " IN (3, 5)", (5,)),
    ("SELECT count() AS c FROM (WITH 2 AS k SELECT number % 3 AS g,"
     " number FROM numbers(9) ORDER BY g, number LIMIT 2 BY g)", (6,)),
    ("WITH 10 AS m SELECT count() AS c FROM (WITH 3 AS k SELECT"
     " number FROM numbers(10) WHERE number < k) WHERE m > 0", (3,)),
    # join + aggregate + HAVING through the dialect in one shape
    ("SELECT b.number AS k, count() AS c FROM numbers(10) AS a INNER"
     " JOIN (SELECT number % 3 AS number FROM numbers(9)) AS b ON"
     " a.number = b.number GROUP BY k HAVING count() >= 3 ORDER BY k"
     " LIMIT 1", (0, 3)),
    # --- collision-sweep batch r11a (VERDICT r10 item 2): CH names a
    # Spark builtin would otherwise capture with different semantics
    ("SELECT round(2.5) AS a, round(3.5) AS b, round(-2.5) AS c,"
     " round(2.567, 2) AS d", (2.0, 4.0, -2.0, 2.57)),
    ("SELECT trunc(23.98) AS a, trunc(-23.98) AS b,"
     " truncate(1.77, 1) AS c", (23.0, -23.0, 1.7)),
    ("SELECT dayName(toDate('2024-05-17')) AS d,"
     " monthName(toDate('2024-03-01')) AS m", ("Friday", "March")),
    ("SELECT DAYOFWEEK(toDate('2024-05-17')) AS f,"
     " dayOfWeek(toDate('2024-05-19')) AS s", (5, 7)),
    ("SELECT left('hello', -2) AS a, right('hello', -2) AS b,"
     " left('hello', 3) AS c, right('hello', 99) AS d",
     ("hel", "llo", "hel", "hello")),
    ("SELECT leftUTF8('привет', 4) AS a, rightUTF8('привет', -1) AS b,"
     " reverseUTF8('привет') AS c", ("прив", "ривет", "тевирп")),
    ("SELECT greatest(1, NULL) AS a, least(NULL, 3) AS b,"
     " max2(1, NULL) AS c, min2(NULL, 2) AS d", (None, None, None, None)),
    ("SELECT concatWithSeparator('-', 'a', NULL) AS a,"
     " concat_ws('-', 'x', 'y') AS b", (None, "x-y")),
    ("SELECT isNaN(NULL) AS a, isNaN(divide(0, 0)) AS b,"
     " isNaN(1.5) AS c", (None, True, False)),
    ("SELECT hex('abc') AS a, unhex('303132') AS b", ("616263", "012")),
    ("SELECT hex(10) AS h", None),      # runtime raise — loud-error
    ("SELECT bin(10) AS b", None),      # clean-raise (width unknowable)
    ("SELECT rand() % 100 < 200 AS r", (True,)),  # UInt32 draw bridge
    # CH registers the MySQL/SQL-standard members case-INSENSITIVELY —
    # uppercase spellings must hit the same bridges (review r11a)
    ("SELECT ROUND(2.5) AS a, TRUNC(-1.77, 1) AS b, LEFT('hello', -2)"
     " AS c, GREATEST(1, NULL) AS d, HEX('ab') AS e,"
     " MONTHNAME(toDate('2024-03-01')) AS f",
     (2.0, -1.7, "hel", None, "6162", "March")),
    ("SELECT POSITION('Hello, world!', 'o') AS p", (5,)),
    ("SELECT left('hello', CAST(NULL AS Int32)) AS n", (None,)),
    ("SELECT toDate(date_add(YEAR, 3, toDate('2018-01-01'))) AS a,"
     " toDate(date_sub(DAY, 2, toDate('2018-01-03'))) AS b",
     None),  # ok-run: DATE values pinned in test_builtin_collisions
    ("SELECT extract('hello123world', '[0-9]+') AS a,"
     " extract('key=val', 'key=([a-z]+)') AS b", ("123", "val")),
    # --- r11b: * APPLY / COLUMNS resolved from the session catalog
    # (plain-FROM blocks only; joins/subqueries keep the named raise)
    ("SELECT * EXCEPT (sec_code, board) APPLY(count) FROM"
     " (SELECT * FROM securities) AS s", None),  # clean-raise: subquery
    ("SELECT COLUMNS('^(price|quantity)$') APPLY(max) FROM trades",
     None),  # ok-run (values are testdata-dependent)
    ("SELECT count() AS c FROM (SELECT COLUMNS('^sec_code$') FROM"
     " securities)", None),  # ok-run: COLUMNS inside a subquery block
    # --- r11c: WITH FILL INTERPOLATE (LOCF) + execution tails
    ("SELECT number AS m, number * 10 AS v FROM numbers(6) WHERE"
     " number IN (1, 4) ORDER BY m WITH FILL FROM 0 TO 6"
     " INTERPOLATE (v)", None),  # ok-run; values pinned in pytest
    ("SELECT number AS m FROM numbers(3) WHERE number != 1 ORDER BY m"
     " WITH FILL STEP 1 SETTINGS max_threads = 2", None),
    ("SELECT number AS m FROM numbers(9) WHERE number IN (0, 8)"
     " ORDER BY m WITH FILL LIMIT 3", None),
    ("SELECT number AS m FROM numbers(3) ORDER BY m WITH FILL"
     " FROM 0 TO 2000000000 STEP 1", None),   # loud grid-cap raise
    ("SELECT number AS m, number AS v FROM numbers(3) ORDER BY m"
     " WITH FILL INTERPOLATE (v AS v + 1)", None),  # clean-raise
    # --- r11d: windowFunnel strict_order (CH docs example: the D
    # interloper stops A->B->C at level 2; default mode ignores it)
    ("SELECT windowFunnel(100, 'strict_order')(toDateTime(ts), e = 'A',"
     " e = 'B', e = 'C') AS lvl FROM (SELECT 10 AS ts, 'A' AS e UNION"
     " ALL SELECT 20, 'B' UNION ALL SELECT 30, 'D' UNION ALL SELECT"
     " 40, 'C')", (2,)),
    ("SELECT windowFunnel(100)(toDateTime(ts), e = 'A', e = 'B',"
     " e = 'C') AS lvl FROM (SELECT 10 AS ts, 'A' AS e UNION ALL"
     " SELECT 20, 'B' UNION ALL SELECT 30, 'D' UNION ALL SELECT"
     " 40, 'C')", (3,)),
    # strict_deduplication bridged r14: the repeat's index wins only
    # before completion; here B repeats after level 2 was reached at
    # ts=20, but n=2 completed first -> 2
    ("SELECT windowFunnel(100, 'strict_deduplication')(toDateTime(ts),"
     " e = 'A', e = 'B') AS lvl FROM (SELECT 10 AS ts, 'A' AS e"
     " UNION ALL SELECT 20, 'B' UNION ALL SELECT 30, 'B')", (2,)),
    # repeat BEFORE completion (n=3): B's slot refills at ts=30 -> 2
    ("SELECT windowFunnel(100, 'strict_deduplication')(toDateTime(ts),"
     " e = 'A', e = 'B', e = 'C') AS lvl FROM (SELECT 10 AS ts,"
     " 'A' AS e UNION ALL SELECT 20, 'B' UNION ALL SELECT 30, 'B'"
     " UNION ALL SELECT 40, 'C')", (2,)),
    # --- r11e: the four ASOF comparators through the SQL bridge
    # (trades_core ⋈ sess_windows derived views; values pinned in
    # test_asof.py vs DuckDB's own ASOF JOIN — these are run-probes)
    ("SELECT count() AS c FROM trades_core AS t ASOF JOIN sess_windows"
     " AS w ON t.sec_code = w.sec_code AND t.time_s > w.win_start",
     None),
    ("SELECT count() AS c FROM trades_core AS t ASOF LEFT JOIN"
     " sess_windows AS w ON t.sec_code = w.sec_code AND"
     " t.time_s <= w.win_start", None),
    ("SELECT count() AS c FROM trades_core AS t ASOF JOIN sess_windows"
     " AS w ON t.sec_code = w.sec_code AND t.time_s < w.win_start",
     None),
    ("SELECT count() AS c FROM trades_core AS t ASOF JOIN sess_windows"
     " AS w ON t.sec_code = w.sec_code AND w.win_start <= t.time_s",
     None),
    # --- r12h/r12i: the widened ASOF spellings, value-pinned on
    # inline relations (CTE sides, subquery sides, INNER keyword,
    # USING with the fixed >= last-column key, bare right-ts name)
    ("WITH lhs AS (SELECT 1 AS g, 5 AS v UNION ALL SELECT 1 AS g,"
     " 2 AS v), rhs AS (SELECT 1 AS g, 3 AS rv UNION ALL SELECT 1"
     " AS g, 4 AS rv) SELECT CAST(sum(v) AS BIGINT) AS sv,"
     " CAST(sum(rv) AS BIGINT) AS sr FROM lhs ASOF JOIN rhs"
     " ON lhs.g = rhs.g AND lhs.v >= rhs.rv", (5, 4)),
    ("WITH lhs AS (SELECT 1 AS g, 5 AS v UNION ALL SELECT 1 AS g,"
     " 1 AS v), rhs AS (SELECT 1 AS g, 3 AS rv) SELECT count() AS n,"
     " count(rv) AS m FROM lhs ASOF LEFT JOIN rhs ON lhs.g = rhs.g"
     " AND lhs.v >= rhs.rv", (2, 1)),
    ("SELECT a.v AS v, b.rv AS rv FROM (SELECT 1 AS g, 5 AS v) AS a"
     " ASOF INNER JOIN (SELECT 1 AS g, 3 AS rv UNION ALL SELECT 1"
     " AS g, 4 AS rv) AS b ON a.g = b.g AND a.v >= b.rv", (5, 4)),
    ("WITH lhs AS (SELECT 1 AS g, 5 AS ts), rhs AS (SELECT 1 AS g,"
     " 3 AS ts UNION ALL SELECT 1 AS g, 4 AS ts) SELECT ts,"
     " rhs.ts AS mts FROM lhs ASOF JOIN rhs USING (g, ts)", (5, 4)),
    ("SELECT 1 FROM (SELECT 1 AS g, 5 AS v) ASOF JOIN (SELECT 1 AS g,"
     " 3 AS rv) ON g = g AND v >= rv", None),  # clean-raise: aliases
    # --- r12l: pagination spellings + QUALIFY (CH parses all of
    # these; Spark none — bridged to LIMIT/OFFSET + wrapper filter)
    ("SELECT CAST(sum(v) AS BIGINT) AS s FROM (SELECT number AS v"
     " FROM numbers(10) ORDER BY v LIMIT 2, 3)", (9,)),
    ("SELECT CAST(sum(v) AS BIGINT) AS s FROM (SELECT number AS v"
     " FROM numbers(10) ORDER BY v OFFSET 2 ROWS FETCH FIRST 3 ROWS"
     " ONLY)", (9,)),
    ("SELECT count() AS c FROM (SELECT v FROM (SELECT number % 3 AS v"
     " FROM numbers(9)) ORDER BY v FETCH FIRST 4 ROWS WITH TIES)",
     (6,)),
    ("SELECT CAST(sum(v) AS BIGINT) AS s FROM (SELECT number AS v"
     " FROM numbers(5) ORDER BY v OFFSET 3 ROWS)", (7,)),
    ("SELECT g, v FROM (SELECT number % 2 AS g, number AS v FROM"
     " numbers(6)) QUALIFY row_number() OVER (PARTITION BY g ORDER BY"
     " v DESC) = 1 ORDER BY g LIMIT 1", (0, 4)),
    ("SELECT number AS v FROM numbers(9) ORDER BY v OFFSET 1 ROWS"
     " FETCH FIRST 4 ROWS WITH TIES", None),  # clean-raise: no seam
    # --- r12m: C-style ternary, :: casts, (tuple).N access
    ("SELECT number % 2 = 0 ? 'even' : 'odd' AS p FROM numbers(1)",
     ("even",)),
    ("SELECT CAST(sum(number % 2 = 0 ? number : -number) AS BIGINT)"
     " AS s FROM numbers(5)", (2,)),
    ("SELECT 300::UInt8 AS w, '7'::Int64::String AS c,"
     " (1 + 2)::String AS p", (44, "7", "3")),
    ("SELECT tuple(3, 'x').1 AS a, tuple(tuple(1, 2), 'y').1.2 AS b",
     (3, 2)),
    ("SELECT 1 ? 2 FROM numbers(1)", None),  # clean-raise: no ':'
    # --- r12n: SELECT TOP, parenless * EXCEPT col, PASTE JOIN
    ("SELECT CAST(sum(v) AS BIGINT) AS s FROM (SELECT TOP 3 number"
     " AS v FROM numbers(10) ORDER BY v DESC)", (24,)),
    ("SELECT * EXCEPT v FROM (SELECT 1 AS g, 2 AS v)", (1,)),
    ("SELECT * FROM (SELECT 1 AS a) PASTE JOIN (SELECT 2 AS b)",
     None),  # clean-raise: positional pairing is order-undefined
    # --- r11f: regression pair, ties, base64, set-op discipline
    # y = 2x + 1 exactly → (k, b) = (2, 1)
    ("SELECT tupleElement(simpleLinearRegression(number,"
     " number * 2 + 1), 1) AS k, tupleElement(simpleLinearRegression("
     "number, number * 2 + 1), 2) AS b FROM numbers(10)", (2.0, 1.0)),
    ("SELECT tryBase64Decode('YWJj') AS a, tryBase64Decode('###') AS b,"
     " base64Decode(base64Encode('xy')) AS c", ("abc", "", "xy")),
    # WITH TIES: [0,0,0,1,1] LIMIT 2 keeps all three tied zeros —
    # top-level-only bridge (the row-count pin lives in pytest);
    # the nested spelling raises by name
    ("SELECT number % 2 AS v FROM numbers(5) ORDER BY v"
     " LIMIT 2 WITH TIES", None),
    ("SELECT count() AS c FROM (SELECT number % 2 AS v FROM numbers(5)"
     " ORDER BY v LIMIT 2 WITH TIES)", None),  # clean-raise: nested
    ("SELECT count() AS c FROM (SELECT number FROM numbers(6)"
     " INTERSECT DISTINCT SELECT number FROM numbers(4))", (4,)),
    ("SELECT count() AS c FROM (SELECT number FROM numbers(6)"
     " EXCEPT DISTINCT SELECT number FROM numbers(4))", (2,)),
    # bare INTERSECT/EXCEPT keep left duplicates in CH (membership
    # filter) — neither Spark's bare (dedup) nor ALL (bag subtract):
    # clean-raise by name
    ("SELECT number FROM numbers(6) INTERSECT SELECT number FROM"
     " numbers(4)", None),
    ("SELECT number FROM numbers(6) EXCEPT SELECT number FROM"
     " numbers(4)", None),
    # WITH ROLLUP passes through: subtotal key columns are NULL here
    # vs CH's type defaults — the documented WITH TOTALS deviation
    # (run-probe; the pin lives in test_ch_compat)
    ("SELECT number % 2 AS g, count() AS c FROM numbers(6)"
     " GROUP BY g WITH ROLLUP", None),
    # --- r11g: interval/slope aggregates + URL label family
    # boundingRatio: slope between leftmost and rightmost points —
    # points (0,0)..(9,27) with y = 3x → 3
    ("SELECT boundingRatio(number, number * 3) AS r FROM numbers(10)",
     (3.0,)),
    # union length: [0,3] ∪ [2,5] ∪ [7,8] = 5 + 1 = 6
    ("SELECT intervalLengthSum(s, e) AS l FROM (SELECT 0 AS s, 3 AS e"
     " UNION ALL SELECT 2, 5 UNION ALL SELECT 7, 8)", (6.0,)),
    # touching segments count once, gaps don't count
    ("SELECT intervalLengthSum(s, e) AS l FROM (SELECT 1 AS s, 3 AS e"
     " UNION ALL SELECT 3, 5)", (4.0,)),
    # CH docs examples: topLevelDomain('svn.hutmegs.co.uk') = 'uk';
    # firstSignificantSubdomain: news.clickhouse.com.tr → clickhouse
    ("SELECT topLevelDomain('svn.hutmegs.co.uk') AS a,"
     " topLevelDomain('https://news.clickhouse.com/') AS b,"
     " topLevelDomain('localhost') AS c", ("uk", "com", "")),
    ("SELECT firstSignificantSubdomain('https://news.clickhouse.com.tr/')"
     " AS a, firstSignificantSubdomain('https://news.clickhouse.com/')"
     " AS b, cutToFirstSignificantSubdomain("
     "'https://news.clickhouse.com.tr/') AS c",
     ("clickhouse", "clickhouse", "clickhouse.com.tr")),
    # overlay: CH added it for standard compat; NEGATIVE offsets count
    # from the end (-3 on a 9-char string = position 7) — bridged
    ("SELECT overlay('Spark SQL', 'CORE', 7) AS a,"
     " overlay('Spark SQL', 'CORE', -3) AS b",
     ("Spark CORE", "Spark CORE")),
    # IP-literal hosts: numeric TLD excluded like CH ('' on all three)
    ("SELECT topLevelDomain('http://127.0.0.1/x') AS a,"
     " firstSignificantSubdomain('http://127.0.0.1/x') AS b,"
     " cutToFirstSignificantSubdomain('http://127.0.0.1/x') AS c",
     ("", "", "")),
    # --- r11h: COMPOSITION shapes — bridges interacting with each
    # other and with the pre-existing rewrites (interactions are
    # where the review passes keep finding silent bugs)
    # round() inside an -If combinator and under GROUP BY
    ("SELECT sumIf(round(number + 0.5), number % 2 = 0) AS s"
     " FROM numbers(4)", (2.0,)),  # round(0.5)=0, round(2.5)=2
    # DAYOFWEEK composed with the 3-arg date_add bridge, under ORDER BY
    ("SELECT DAYOFWEEK(date_add(DAY, number, toDate('2024-05-13')))"
     " AS d FROM numbers(3) ORDER BY d", (1,)),
    # dateAdd 3-arg feeding toStartOfInterval (nested structural)
    ("SELECT CAST(toStartOfInterval(date_add(HOUR, 3,"
     " toDateTime('2024-01-01 00:10:00')), INTERVAL 1 HOUR)"
     " AS STRING) AS t", ("2024-01-01 03:00:00",)),
    # greatest/least wrappers nested in each other and in ORDER BY
    ("SELECT greatest(least(number, 3), 1) AS g FROM numbers(6)"
     " ORDER BY greatest(number, 2) DESC LIMIT 1", (3,)),
    # overlay nested in concat + left/right composition
    ("SELECT concat(left('abcdef', -3), overlay('xyz', 'Z', -1)) AS c",
     ("abcxyZ",)),
    # intervalLengthSum skips NULL-bound rows (CH aggregate-NULL rule)
    ("SELECT intervalLengthSum(s, e) AS l FROM (SELECT 1 AS s, 3 AS e"
     " UNION ALL SELECT NULL, 9 UNION ALL SELECT 5, NULL)", (2.0,)),
    # trunc under CAST + isNaN(divide) in one projection
    ("SELECT CAST(trunc(2.99) AS Int64) AS t,"
     " isNaN(divide(0, 0)) AS n", (2, True)),
    # COLUMNS APPLY under a WHERE + alias-in-WHERE inlining
    ("SELECT count() AS c FROM (SELECT COLUMNS('^price$') APPLY(max)"
     " FROM trades)", (1,)),
    # WITH FILL over a LIMIT BY subquery result (fill extraction sees
    # only the OUTER order by; the inner LIMIT BY translates inside)
    ("SELECT count() AS c FROM (SELECT m FROM (SELECT number % 5 AS g,"
     " intDiv(number, 5) AS m FROM numbers(40) ORDER BY g, m"
     " LIMIT 1 BY g) ORDER BY m)", (5,)),
    # the classic aggregates are CH's CASE-INSENSITIVE registrations:
    # ANY(x) is the CH pick-a-value aggregate even on a BOOLEAN
    # column (Spark's boolean any() must not capture it), and the
    # quantified comparison keeps working in any case
    ("SELECT ANY(b) AS v FROM (SELECT true AS b UNION ALL"
     " SELECT true)", (True,)),
    ("SELECT Any(number) AS v FROM numbers(1)", (0,)),
    # quantified subquery comparisons (r12b): bridged to the
    # NULL-exact CASE over min/max scalar subqueries, value-pinned
    # vs DuckDB in test_ch_compat.py incl. empty/NULL-set cases
    ("SELECT count() AS c FROM numbers(5) WHERE number > ANY"
     " (SELECT number FROM numbers(3))", (4,)),
    ("SELECT count() AS c FROM numbers(5) WHERE number >= ALL"
     " (SELECT number FROM numbers(3))", (3,)),
    ("SELECT count() AS c FROM numbers(5) WHERE number = ANY"
     " (SELECT number * 2 FROM numbers(3))", (3,)),
    ("SELECT count() AS c FROM numbers(5) WHERE number != ALL"
     " (SELECT number * 2 FROM numbers(2))", (3,)),
    ("SELECT 3 < ANY (SELECT number FROM numbers(5)) AS r", (True,)),
    ("SELECT 9 > ALL (SELECT number FROM numbers(5) WHERE"
     " number > 99) AS r", (True,)),  # empty set: ALL is vacuously true
    # --- r11i: array enumeration, multi-search, tokens, JSON shape
    ("SELECT arrayEnumerateUniq([10, 20, 10, 30, 10]) AS a,"
     " arrayEnumerateDense([10, 20, 10]) AS d", ([1, 1, 2, 1, 3],
                                                 [1, 2, 1])),
    ("SELECT arrayIntersect([1, 2, 3], [3, 1], [1, 3, 5]) AS a",
     ([1, 3],)),
    ("SELECT multiSearchAny('Hello, World!', ['orld', 'zzz']) AS y,"
     " multiSearchAny('Hello', ['x']) AS n", (True, False)),
    ("SELECT hasToken('Hello World foo', 'World') AS y,"
     " hasToken('HelloWorld foo', 'World') AS n,"
     " hasTokenOrNull('a b', 'a b') AS z", (True, False, None)),
    ("SELECT hasToken('a b c', 'a b') AS h", None),  # clean-raise
    ("SELECT extractGroups('key=val, n=7', 'key=([a-z]+), n=([0-9]+)')"
     " AS g, extractGroups('miss', 'k=([a-z]+)') AS m",
     (["val", "7"], [])),
    ("SELECT JSONExtractKeys('{\"a\": 1, \"b\": 2}') AS k,"
     " JSONLength('[1,2,3]') AS la, JSONLength('{\"x\":1}') AS lo,"
     " JSONLength('5') AS ls", (["a", "b"], 3, 1, 0)),
    ("SELECT countSubstringsCaseInsensitive('AbaBa', 'ba') AS c,"
     " startsWithUTF8('привет', 'при') AS s,"
     " endsWithUTF8('привет', 'вет') AS e", (2, True, True)),
    # --- r11j: edit distance + a second composition round
    ("SELECT editDistance('clickhouse', 'mouse') AS a,"
     " levenshteinDistance('kitten', 'sitting') AS b,"
     " editDistanceUTF8('привет', 'привет!') AS c,"
     " editDistanceUTF8('ц', 'x') AS d", (6, 3, 1, 1)),
    # BYTE edit distance over multi-byte input (r12c): exact now —
    # the Wagner-Fischer byte fold replaced the r11j runtime raise.
    # 'ц' is 2 bytes vs 1 ASCII byte: substitute + delete = 2 edits
    ("SELECT editDistance('ц', 'x') AS d,"
     " levenshteinDistance('кот', 'кит') AS e,"
     " editDistance('привет', 'privet') AS f", (2, 1, 12)),
    # hasToken over a subquery output column in WHERE
    ("SELECT count() AS c FROM (SELECT 'a b c' AS s FROM numbers(3))"
     " WHERE hasToken(s, 'b')", (3,)),
    # hasToken on a SAME-LEVEL SELECT alias referenced from WHERE
    # (legal in CH, needs the alias-inlining bridge in Spark)
    ("SELECT count() AS c FROM (SELECT concat('a ', 'b') AS s"
     " FROM numbers(2) WHERE hasToken(s, 'b'))", (2,)),
    # extractGroups + arrayElement subscript + tupleElement-free path
    ("SELECT extractGroups('k=v', '([a-z])=([a-z])')[2] AS x", ("v",)),
    # JSONLength over a nested object (outer keys only)
    ("SELECT JSONLength('{\"a\": {\"b\": 1, \"c\": 2}}') AS n,"
     " JSONLength('{\"a\": [1, 2, 3]}') AS m", (1, 1)),
    # arrayEnumerateUniq fed by arrayFilter (nested HOF rewrites):
    # [2, 2, 3] -> occurrence indexes [1, 2, 1]
    ("SELECT arrayEnumerateUniq(arrayFilter(x -> x > 1,"
     " [1, 2, 2, 3])) AS a", ([1, 2, 1],)),
    # multiSearchAny over tokens() output via arrayStringConcat
    ("SELECT multiSearchAny(arrayStringConcat(tokens('a-b c'), ' '),"
     " ['b c']) AS m", (True,)),
    # intervalLengthSum in HAVING, SELECTIVE between groups: g=0
    # holds disjoint unit intervals (union 3), g=1 overlapping
    # 2-wide ones (union 6) — only g=1 passes
    ("SELECT g FROM (SELECT number % 2 AS g, number AS s,"
     " number + 1 + number % 2 AS e FROM numbers(6)) GROUP BY g"
     " HAVING intervalLengthSum(s, e) > 5", (1,)),
    # --- r11k: named raises for sampling / client output / stats
    ("SELECT number FROM numbers(10) SAMPLE 1/2", None),  # clean-raise
    ("SELECT number FROM numbers(3) INTO OUTFILE 'x.csv'", None),
    # studentTTest/welchTTest are EXACT now (r12d): t from conditional
    # aggregates, two-sided p via the inline regularized incomplete
    # beta (Lanczos lgamma + bounded Lentz fold).  numbers(8) % 2:
    # m0=3 m1=4, pooled var 20/3, t = -1/sqrt(10/3), df = 6.
    ("SELECT round(tupleElement(studentTTest(number, number % 2), 1),"
     " 10) AS t, round(tupleElement(studentTTest(number, number % 2),"
     " 2), 6) AS p FROM numbers(8)", (-0.5477225575, 0.603645)),
    ("SELECT round(tupleElement(welchTTest(number, number % 2), 1),"
     " 10) AS t FROM numbers(8)", (-0.5477225575,)),
    ("SELECT exponentialMovingAverage(5)(number, number)"
     " FROM numbers(8)", None),
    ("SELECT maxIntersections(number, number + 2) FROM numbers(5)",
     None),  # all clean-raise with pointers
    # --- r11l: third composition round (older machinery × r11)
    # WITH TOTALS over a bridged round() aggregate projection
    ("SELECT number % 2 AS g, round(sum(number + 0.25), 1) AS s"
     " FROM numbers(4) GROUP BY g WITH TOTALS ORDER BY g NULLS LAST",
     None),  # ok-run: totals row key is NULL (documented deviation)
    # scalar WITH constant inside boundingRatio arguments
    ("WITH 3 AS k SELECT boundingRatio(number, number * k) AS r"
     " FROM numbers(10)", (3.0,)),
    # DISTINCT ON + trunc in the sort key
    ("SELECT count() AS c FROM (SELECT DISTINCT ON (g) g, v FROM"
     " (SELECT trunc(number / 3) AS g, number AS v FROM numbers(9))"
     " ORDER BY g, v)", (3,)),
    # format() placeholder filled by overlay()
    ("SELECT format('[{}]', overlay('abc', 'Z', 2)) AS f", ("[aZc]",)),
    # LIMIT BY ordered by editDistanceUTF8 (expression sort key)
    ("SELECT g, w FROM (SELECT number % 2 AS g, CASE number % 3"
     " WHEN 0 THEN 'cat' WHEN 1 THEN 'cart' ELSE 'dog' END AS w"
     " FROM numbers(6)) ORDER BY g, editDistanceUTF8(w, 'cat'), w"
     " LIMIT 1 BY g", None),  # ok-run (per-group nearest word)
    # hasToken under an ANY LEFT JOIN's USING dedup
    ("SELECT count() AS c FROM (SELECT number % 2 AS k FROM"
     " numbers(4)) AS a ANY LEFT JOIN (SELECT 0 AS k, 'x y' AS s"
     " UNION ALL SELECT 0, 'x y') AS b USING (k)"
     " WHERE hasToken(coalesce(s, ''), 'y')", (2,)),
    # NESTED grammar bridges (probe r11l found ARRAY JOIN only fired
    # top-level — and a subquery ARRAY JOIN that Spark parses as a
    # join against a same-named TABLE would be SILENT): PREWHERE,
    # SETTINGS tails, and ARRAY JOIN now apply per SELECT block
    ("SELECT sum(v) AS s FROM (SELECT number AS v FROM numbers(10)"
     " PREWHERE number > 5)", (30,)),
    ("SELECT count() AS c FROM (SELECT number FROM numbers(5)"
     " SETTINGS max_threads = 1)", (5,)),
    ("SELECT sum(u) AS s FROM (SELECT u FROM (SELECT"
     " arrayEnumerateUniq([7, 7, 8]) AS a FROM numbers(1))"
     " ARRAY JOIN a AS u)", (4,)),
    ("SELECT count() AS c FROM (SELECT k FROM (SELECT 0 AS k) AS a"
     " ANY LEFT JOIN (SELECT 0 AS k UNION ALL SELECT 0) AS b"
     " USING (k))", (1,)),
    # per-branch SETTINGS must NOT eat the following UNION branch
    # (review r11l: the strip cut to end-of-block — silent data loss)
    ("SELECT sum(x) AS s FROM (SELECT 1 AS x SETTINGS max_threads = 1"
     " UNION ALL SELECT 2 AS x)", (3,)),
    # one PREWHERE per UNION branch at the same depth
    ("SELECT sum(x) AS s FROM (SELECT number AS x FROM numbers(4)"
     " PREWHERE number > 2 UNION ALL SELECT number FROM numbers(4)"
     " PREWHERE number > 1)", (8,)),
    # WITH TOTALS inside a subquery (the totals row's NULL key rides
    # into the outer count — _with_totals scans at any depth)
    ("SELECT count() AS c FROM (SELECT number % 2 AS g,"
     " sum(number) AS s FROM numbers(4) GROUP BY g WITH TOTALS)",
     (3,)),
    # UNION DISTINCT: the explicit spelling both engines share
    ("SELECT count() AS c FROM (SELECT number % 2 AS v FROM"
     " numbers(4) UNION DISTINCT SELECT number % 3 FROM numbers(6))",
     (3,)),
    # --- r12a: SYSTEMATIC bridge x nesting grid (VERDICT r11 item 2).
    # Every statement-level bridge (LIMIT BY, DISTINCT ON, ARRAY JOIN,
    # scalar WITH, PREWHERE, SETTINGS, WITH FILL, WITH TOTALS) crossed
    # with {depth-2 subquery, UNION branch, CTE body, IN-subquery},
    # one value-asserted cell each — the r11 late finds (nested ARRAY
    # JOIN, SETTINGS eating a UNION branch, nested PREWHERE) came from
    # this product discovered ad hoc; this enumerates it deliberately.
    # LIMIT BY x {depth2, union, cte, in}
    ("SELECT sum(v) AS s FROM (SELECT g, v FROM (SELECT number % 2 AS g,"
     " number AS v FROM numbers(6)) ORDER BY g, v LIMIT 1 BY g)", (1,)),
    ("SELECT sum(v) AS s FROM ((SELECT v FROM (SELECT g, v FROM (SELECT"
     " number % 2 AS g, number AS v FROM numbers(6)) ORDER BY g, v"
     " LIMIT 1 BY g)) UNION ALL SELECT 100 AS v)", (101,)),
    ("WITH cg1 AS (SELECT g, v FROM (SELECT number % 2 AS g, number AS v"
     " FROM numbers(6)) ORDER BY g, v LIMIT 1 BY g)"
     " SELECT sum(v) AS s FROM cg1", (1,)),
    ("SELECT count() AS c FROM numbers(10) WHERE number IN (SELECT v FROM"
     " (SELECT g, v FROM (SELECT number % 2 AS g, number AS v FROM"
     " numbers(6)) ORDER BY g, v LIMIT 1 BY g))", (2,)),
    # DISTINCT ON x {depth2, union, cte, in}
    ("SELECT sum(v) AS s FROM (SELECT DISTINCT ON (g) g, v FROM (SELECT"
     " number % 3 AS g, number AS v FROM numbers(9)) ORDER BY g, v)", (3,)),
    ("SELECT sum(v) AS s FROM ((SELECT v FROM (SELECT DISTINCT ON (g) g,"
     " v FROM (SELECT number % 3 AS g, number AS v FROM numbers(9))"
     " ORDER BY g, v)) UNION ALL SELECT 100 AS v)", (103,)),
    ("WITH cg2 AS (SELECT DISTINCT ON (g) g, v FROM (SELECT number % 3"
     " AS g, number AS v FROM numbers(9)) ORDER BY g, v)"
     " SELECT sum(v) AS s FROM cg2", (3,)),
    ("SELECT count() AS c FROM numbers(10) WHERE number IN (SELECT v FROM"
     " (SELECT DISTINCT ON (g) g, v FROM (SELECT number % 3 AS g, number"
     " AS v FROM numbers(9)) ORDER BY g, v))", (3,)),
    # ARRAY JOIN x {depth2, union, cte, in}
    ("SELECT sum(v) AS s FROM (SELECT u AS v FROM (SELECT [1, 2, 3] AS a"
     " FROM numbers(1)) ARRAY JOIN a AS u)", (6,)),
    ("SELECT sum(v) AS s FROM ((SELECT u AS v FROM (SELECT [1, 2, 3] AS a"
     " FROM numbers(1)) ARRAY JOIN a AS u) UNION ALL SELECT 100 AS v)",
     (106,)),
    ("WITH cg3 AS (SELECT u AS v FROM (SELECT [1, 2, 3] AS a FROM"
     " numbers(1)) ARRAY JOIN a AS u) SELECT sum(v) AS s FROM cg3", (6,)),
    ("SELECT count() AS c FROM numbers(10) WHERE number IN (SELECT u AS v"
     " FROM (SELECT [1, 2, 3] AS a FROM numbers(1)) ARRAY JOIN a AS u)",
     (3,)),
    # scalar WITH x {depth2, union, cte, in}
    ("SELECT sum(v) AS s FROM (WITH 5 AS k SELECT number * k AS v"
     " FROM numbers(3))", (15,)),
    ("SELECT sum(v) AS s FROM ((WITH 5 AS k SELECT number * k AS v"
     " FROM numbers(3)) UNION ALL SELECT 100 AS v)", (115,)),
    ("WITH cg4 AS (WITH 5 AS k SELECT number * k AS v FROM numbers(3))"
     " SELECT sum(v) AS s FROM cg4", (15,)),
    ("SELECT count() AS c FROM numbers(10) WHERE number IN (WITH 5 AS k"
     " SELECT number * k AS v FROM numbers(3))", (2,)),
    # PREWHERE x {depth2, union, cte, in}
    ("SELECT sum(v) AS s FROM (SELECT v FROM (SELECT number AS v FROM"
     " numbers(10) PREWHERE number > 5))", (30,)),
    ("SELECT sum(v) AS s FROM ((SELECT number AS v FROM numbers(10)"
     " PREWHERE number > 5) UNION ALL SELECT 100 AS v)", (130,)),
    ("WITH cg5 AS (SELECT number AS v FROM numbers(10) PREWHERE"
     " number > 5) SELECT sum(v) AS s FROM cg5", (30,)),
    ("SELECT count() AS c FROM numbers(10) WHERE number IN (SELECT number"
     " AS v FROM numbers(10) PREWHERE number > 5)", (4,)),
    # SETTINGS x {depth2, union, cte, in}
    ("SELECT sum(v) AS s FROM (SELECT v FROM (SELECT number AS v FROM"
     " numbers(5) SETTINGS max_threads = 1))", (10,)),
    ("SELECT sum(v) AS s FROM ((SELECT number AS v FROM numbers(5)"
     " SETTINGS max_threads = 1) UNION ALL SELECT 100 AS v)", (110,)),
    ("WITH cg6 AS (SELECT number AS v FROM numbers(5) SETTINGS"
     " max_threads = 1) SELECT sum(v) AS s FROM cg6", (10,)),
    ("SELECT count() AS c FROM numbers(10) WHERE number IN (SELECT number"
     " AS v FROM numbers(5) SETTINGS max_threads = 1)", (5,)),
    # WITH FILL x {depth2, union, cte, in}: the outermost-only contract
    # raises by name in every nested position (clean-raise cells)
    ("SELECT sum(v) AS s FROM (SELECT v FROM (SELECT number * 2 AS v FROM"
     " numbers(3)) ORDER BY v WITH FILL FROM 0 TO 5)", None),
    ("SELECT sum(v) AS s FROM ((SELECT v FROM (SELECT number * 2 AS v"
     " FROM numbers(3)) ORDER BY v WITH FILL FROM 0 TO 5)"
     " UNION ALL SELECT 100 AS v)", None),
    ("WITH cg7 AS (SELECT v FROM (SELECT number * 2 AS v FROM numbers(3))"
     " ORDER BY v WITH FILL FROM 0 TO 5) SELECT sum(v) AS s FROM cg7",
     None),
    ("SELECT count() AS c FROM numbers(10) WHERE number IN (SELECT v FROM"
     " (SELECT number * 2 AS v FROM numbers(3)) ORDER BY v WITH FILL"
     " FROM 0 TO 5)", None),
    # WITH TOTALS x {depth2, union, cte, in}
    ("SELECT sum(v) AS s FROM (SELECT g, sum(x) AS v FROM (SELECT"
     " number % 2 AS g, number AS x FROM numbers(4)) GROUP BY g"
     " WITH TOTALS)", (12,)),
    ("SELECT sum(v) AS s FROM ((SELECT g, sum(x) AS v FROM (SELECT"
     " number % 2 AS g, number AS x FROM numbers(4)) GROUP BY g"
     " WITH TOTALS) UNION ALL SELECT 9 AS g, 100 AS v)", (112,)),
    ("WITH cg8 AS (SELECT g, sum(x) AS v FROM (SELECT number % 2 AS g,"
     " number AS x FROM numbers(4)) GROUP BY g WITH TOTALS)"
     " SELECT sum(v) AS s FROM cg8", (12,)),
    ("SELECT count() AS c FROM numbers(10) WHERE number IN (SELECT v FROM"
     " (SELECT g, sum(x) AS v FROM (SELECT number % 2 AS g, number AS x"
     " FROM numbers(4)) GROUP BY g WITH TOTALS))", (3,)),
    # --- r12a second tier: PAIRWISE bridge combos in one block ---
    ("SELECT sum(v) AS s FROM (SELECT number AS v FROM numbers(10)"
     " PREWHERE number > 5 SETTINGS max_threads = 1)", (30,)),
    ("SELECT sum(u) AS s FROM (SELECT u FROM (SELECT number AS n, [1, 2]"
     " AS a FROM numbers(4)) ARRAY JOIN a AS u PREWHERE n > 1)", (6,)),
    ("SELECT sum(u) AS s FROM (SELECT u FROM (SELECT [1, 2, 3] AS a"
     " FROM numbers(1)) ARRAY JOIN a AS u SETTINGS max_threads = 1)",
     (6,)),
    ("SELECT sum(v) AS s FROM (SELECT g, v FROM (SELECT number % 2 AS g,"
     " number AS v FROM numbers(6)) ORDER BY g, v LIMIT 1 BY g"
     " SETTINGS max_threads = 1)", (1,)),
    ("SELECT sum(v) AS s FROM (SELECT DISTINCT ON (g) g, v FROM (SELECT"
     " number % 3 AS g, number AS v FROM numbers(9)) PREWHERE v > 2"
     " ORDER BY g, v)", (12,)),
    ("SELECT sum(v) AS s FROM (WITH 5 AS k SELECT number * k AS v"
     " FROM numbers(4) PREWHERE number > 1)", (25,)),
    ("SELECT sum(v) AS s FROM (SELECT g, sum(x) AS v FROM (SELECT"
     " number % 2 AS g, number AS x FROM numbers(4)) GROUP BY g"
     " WITH TOTALS SETTINGS max_threads = 1)", (12,)),
    ("SELECT sum(v) AS s FROM (SELECT g, v FROM (SELECT number % 2 AS g,"
     " number AS v FROM numbers(8)) PREWHERE v > 3 ORDER BY g, v"
     " LIMIT 1 BY g)", (9,)),
    ("SELECT sum(v) AS s FROM (WITH 2 AS k SELECT number % 2 AS g,"
     " number * k AS v FROM numbers(6) ORDER BY g, v LIMIT 1 BY g)",
     (2,)),
    ("WITH cg9 AS (SELECT number AS v FROM numbers(4) PREWHERE number > 2"
     " UNION ALL SELECT u FROM (SELECT [5, 6] AS a FROM numbers(1))"
     " ARRAY JOIN a AS u) SELECT sum(v) AS s FROM cg9", (14,)),
    ("SELECT count() AS c FROM numbers(10) WHERE number IN"
     " (WITH 2 AS k SELECT number * k AS v FROM numbers(4)"
     " PREWHERE number > 0)", (3,)),
    ("SELECT sum(v) AS s FROM ((SELECT g, sum(x) AS v FROM (SELECT"
     " number % 2 AS g, number AS x FROM numbers(4)) GROUP BY g"
     " WITH TOTALS SETTINGS max_threads = 1) UNION ALL"
     " SELECT 9, 100)", (112,)),
    # --- r12c: quantified x nesting compositions + the CASE-paren
    # walker fix (review r12b found LIMIT BY inside `CASE WHEN
    # (SELECT ...)` was invisible to every per-block bridge — the
    # recursion now WALKS non-SELECT paren groups without applying
    # block rewrites at their own level)
    ("SELECT sum(v) AS s FROM (SELECT number AS v FROM numbers(10)"
     " WHERE number > ANY (SELECT number + 5 FROM numbers(3)))", (30,)),
    ("SELECT sum(v) AS s FROM ((SELECT number AS v FROM numbers(6)"
     " WHERE number >= ALL (SELECT number FROM numbers(4)))"
     " UNION ALL SELECT 100 AS v)", (112,)),
    ("WITH cq AS (SELECT number AS v FROM numbers(8)"
     " WHERE number = ANY (SELECT number * 2 FROM numbers(4)))"
     " SELECT sum(v) AS s FROM cq", (12,)),
    ("SELECT count() AS c FROM (SELECT number % 2 AS g, sum(number) AS s"
     " FROM numbers(6) GROUP BY g HAVING sum(number) > ANY"
     " (SELECT number FROM numbers(5)))", (2,)),
    ("SELECT sum(CAST(number < ANY (SELECT number FROM numbers(3))"
     " AS INT)) AS s FROM numbers(5)", (2,)),
    ("SELECT sum(v) AS s FROM (SELECT number AS v FROM numbers(10)"
     " PREWHERE number > 2) WHERE v <= ALL (SELECT 9)", (42,)),
    ("SELECT count() AS c FROM numbers(10) WHERE number > ANY (SELECT 2)"
     " AND number < ALL (SELECT number + 8 FROM numbers(2))", (5,)),
    ("SELECT count() AS c FROM numbers(10) WHERE number = ANY (SELECT v"
     " FROM (SELECT g, v FROM (SELECT number % 2 AS g, number AS v FROM"
     " numbers(6)) ORDER BY g, v LIMIT 1 BY g))", (2,)),
    ("SELECT CASE WHEN (SELECT count() FROM (SELECT number FROM"
     " numbers(3) SETTINGS max_threads = 1)) > 2 THEN 7 ELSE 0 END"
     " AS x", (7,)),
    ("SELECT sum(u) AS s FROM (SELECT CASE WHEN 1 = 1 THEN (SELECT"
     " sum(x) FROM (SELECT number AS x FROM numbers(4) PREWHERE"
     " number > 1)) ELSE 0 END AS u FROM numbers(2))", (10,)),
    # --- r12e: CH window-function spellings + named-raise tail
    ("SELECT number AS n, lagInFrame(number, 1, 99) OVER (ORDER BY"
     " number ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED"
     " FOLLOWING) AS l FROM numbers(3) ORDER BY n LIMIT 1", (0, 99)),
    ("SELECT leadInFrame(number) OVER (ORDER BY number ROWS BETWEEN"
     " UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS l FROM"
     " numbers(2) ORDER BY l NULLS LAST LIMIT 1", (1,)),
    # previously raw-loud; now named raises with window spellings
    ("SELECT exponentialTimeDecayedSum(10)(number, number)"
     " OVER (ORDER BY number) AS d FROM numbers(4)", None),
    ("SELECT nonNegativeDerivative(number, now())"
     " OVER (ORDER BY number) AS d FROM numbers(2)", None),
    # CH resolves ALIASES over source columns (prefer_column_name_to_
    # alias = 0): the alias v (= v*10) wins in WHERE, so v*10 > 25
    # keeps 7 of 10 rows — ANSI column-wins engines would keep 0.
    # The inliner reproduces CH's rule (r12f fuzz follow-up pin).
    ("SELECT count() AS c FROM (SELECT v * 10 AS v FROM"
     " (SELECT number AS v FROM numbers(10)) WHERE v > 25)", (7,)),
    # r12g: CH sorts NULLs LAST by default in BOTH directions —
    # Spark's ASC default is NULLS FIRST, a silent-value diff for
    # every ORDER-BY-driven pick over a NULL-bearing key.  min/skip
    # shapes assert the PICK, not just presentation order.
    ("SELECT v FROM (SELECT CASE WHEN number = 0 THEN NULL ELSE"
     " number END AS v FROM numbers(3)) ORDER BY v LIMIT 1", (1,)),
    ("SELECT v FROM (SELECT CASE WHEN number = 2 THEN NULL ELSE"
     " number END AS v FROM numbers(3)) ORDER BY v DESC LIMIT 1",
     (1,)),
    ("SELECT count() AS c FROM (SELECT g, v FROM (SELECT number % 2"
     " AS g, CASE WHEN number < 2 THEN NULL ELSE number END AS v"
     " FROM numbers(6)) ORDER BY g, v LIMIT 1 BY g) WHERE v IS NOT"
     " NULL", (2,)),
    # ---- round-13 shapes: advice quintet, quantified hardening,
    # nested WITH TIES, fill-under-union, block-scoped ASOF strip ----
    ("SELECT 'x,y' = 'x,y' ? 1 : 0 AS r", (1,)),
    ("SELECT s = 'x,y' ? 1 : 0 AS r FROM (SELECT 'a,b' AS s)", (0,)),
    ("SELECT number AS v FROM numbers(3) QUALIFY row_number()"
     " OVER (ORDER BY number) = 1 ? true : false", (0,)),
    ("SELECT TOP 1 * EXCEPT (v) FROM (SELECT 1 AS g, 2 AS v)", (1,)),
    ("SELECT TOP 2 * EXCEPT v FROM (SELECT number % 2 AS g,"
     " number AS v FROM numbers(4)) ORDER BY g", None),
    ("SELECT tuple(300, 1).1::UInt8 AS c", (44,)),
    ("SELECT (tuple(7, 'x')).2::Nullable(String) AS c", ("x",)),
    ("SELECT CAST(sum(v) AS BIGINT) AS s FROM (SELECT v FROM"
     " (SELECT number % 3 AS v FROM numbers(9)) ORDER BY v"
     " FETCH FIRST 4 ROWS WITH TIES)", (3,)),
    ("SELECT count() AS c FROM (SELECT number AS v FROM numbers(5)"
     " ORDER BY v LIMIT 2 WITH TIES)", (2,)),
    # tuple left operand: named raise (multi-column quantifier)
    ("SELECT (a, b) = ANY (SELECT 1, 2) AS r"
     " FROM (SELECT 1 AS a, 2 AS b)", None),
    ("SELECT g AS r FROM (SELECT 1 AS g, 5 AS v) t WHERE v > ANY"
     " (SELECT rv FROM (SELECT 1 AS g, 3 AS rv) u WHERE u.g = t.g)",
     (1,)),
    # = ANY membership rides IN now; ANSI NULL answer preserved
    ("SELECT 5 = ANY (SELECT CASE WHEN number = 0 THEN NULL ELSE"
     " number END FROM numbers(3)) AS r", (None,)),
    ("SELECT CASE WHEN 2 > ANY (SELECT number FROM numbers(3))"
     " THEN 7 ELSE 0 END AS r", (7,)),
    ("SELECT count() AS c FROM (SELECT number AS v FROM numbers(5)"
     " WHERE v > ANY (SELECT 2) INTERSECT DISTINCT"
     " SELECT number AS v FROM numbers(5) WHERE v >= 3)", (2,)),
    ("SELECT g, v FROM (SELECT 1 AS g, 1 AS v) UNION ALL"
     " SELECT 2 AS g, 5 AS v ORDER BY v WITH FILL FROM 0 TO 6",
     (0, 0)),
    # GROUP BY ALL / ORDER BY ALL: CH and Spark 4 agree natively
    # (pinned so a regression in either engine or a future rewrite
    # pass surfaces here)
    ("SELECT number % 2 AS g, CAST(sum(number) AS BIGINT) AS s"
     " FROM numbers(6) GROUP BY ALL ORDER BY g", (0, 6)),
    ("SELECT number % 2 AS g, CAST(count(*) AS BIGINT) AS c"
     " FROM numbers(6) GROUP BY ALL ORDER BY ALL", (0, 3)),
    # chained ASOF (r13): link 2 bridges against link 1's view
    ("SELECT a.v AS v, b.rv AS rv, c.ix AS ix"
     " FROM (SELECT 1 AS g, 10 AS v) AS a"
     " ASOF JOIN (SELECT 1 AS g, 8 AS rv) AS b"
     " ON a.g = b.g AND a.v >= b.rv"
     " ASOF JOIN (SELECT 1 AS g, 9 AS ix) AS c"
     " ON a.g = c.g AND a.v >= c.ix", (10, 8, 9)),
    # two parallel ASOF legs over one shared CTE side (r13 strip fix)
    ("WITH sh AS (SELECT 1 AS g, 4 AS rv)"
     " SELECT CAST(sum(v) AS BIGINT) AS s FROM ("
     " SELECT a.v + coalesce(sh.rv, 0) AS v"
     " FROM (SELECT 1 AS g, 5 AS v) AS a"
     " ASOF LEFT JOIN sh ON a.g = sh.g AND a.v >= sh.rv"
     " UNION ALL SELECT b.v + coalesce(sh.rv, 0) AS v"
     " FROM (SELECT 1 AS g, 9 AS v) AS b"
     " ASOF LEFT JOIN sh ON b.g = sh.g AND b.v >= sh.rv)", (22,)),
    # --- round-14 shapes ---
    # sequenceNextNode: the CH docs' A->B chain from head — the value
    # AFTER the chain (docs.clickhouse.com parametric-functions)
    ("SELECT sequenceNextNode('forward', 'head')(dt, page,"
     " page = 'A', page = 'A', page = 'B') AS n"
     " FROM (SELECT 1 AS dt, 'A' AS page UNION ALL SELECT 2, 'B'"
     " UNION ALL SELECT 3, 'C')", ("C",)),
    # first_match base gated by base_condition (dt >= 2 skips dt=1's B)
    ("SELECT sequenceNextNode('forward', 'first_match')(dt, page,"
     " dt >= 2, page = 'B') AS n"
     " FROM (SELECT 1 AS dt, 'B' AS page UNION ALL SELECT 2, 'B'"
     " UNION ALL SELECT 3, 'D')", ("D",)),
    # backward + tail (supported since the r14 second phase): anchor
    # the latest node, walk the chain back, answer the node before it
    ("SELECT sequenceNextNode('backward', 'tail')(dt, p, p = 'C',"
     " p = 'C', p = 'B') AS n FROM (SELECT 1 AS dt, 'A' AS p"
     " UNION ALL SELECT 2, 'B' UNION ALL SELECT 3, 'C')", ("A",)),
    # CH's own factory rejection: head walks forward only
    ("SELECT sequenceNextNode('backward', 'head')(dt, p, p = 'A') AS n"
     " FROM (SELECT 1 AS dt, 'A' AS p)", None),
    # dotted-qualified primaries before postfix casts / tuple access
    # (advice r14): whole qualified name stays inside the operand
    ("SELECT (t.tup).1::String AS s"
     " FROM (SELECT tuple(7, 'x') AS tup) AS t", ("7",)),
    ("SELECT t.arr[2]::Int64 AS v FROM (SELECT [3, 4] AS arr) AS t",
     (4,)),
    # multi-array ARRAY JOIN over a source already carrying __ajm0
    # (advice r14: uuid-suffixed synthetics)
    ("WITH src AS (SELECT 1 AS k, [10, 20] AS vs, 99 AS __ajm0)"
     " SELECT sum(i * v2) AS s FROM src ARRAY JOIN"
     " arrayEnumerate(vs) AS i, vs AS v2", (50,)),
    # chained ASOF directly followed by a set operator (the r13
    # ON-stop boundary, now fuzz kind asof_chain_setop)
    ("SELECT l.v + coalesce(r.rv, 0) + coalesce(c.ix, 0) AS v"
     " FROM (SELECT 1 AS g, 5 AS v) AS l"
     " ASOF LEFT JOIN (SELECT 1 AS g, 4 AS rv) AS r"
     " ON l.g = r.g AND l.v >= r.rv"
     " ASOF LEFT JOIN (SELECT 1 AS g, 3 AS ix) AS c"
     " ON l.g = c.g AND l.v >= c.ix"
     " INTERSECT DISTINCT SELECT 12 AS v", (12,)),
    # WITH TIES inside a parenthesized set-op branch
    ("(SELECT number AS v FROM numbers(5) ORDER BY v LIMIT 2 WITH"
     " TIES) EXCEPT DISTINCT (SELECT 0 AS v)", (1,)),
    # correlated quantifier inside QUALIFY (sum of per-group maxima)
    ("SELECT sum(v) AS s FROM (SELECT t.v AS v FROM (SELECT"
     " number % 2 AS g, number AS v FROM numbers(6)) AS t"
     " QUALIFY t.v = max(t.v) OVER (PARTITION BY t.g) AND t.v >="
     " ANY (SELECT u.v FROM (SELECT number % 2 AS g, number AS v"
     " FROM numbers(6)) AS u WHERE u.g = t.g))", (9,)),
    # ROLLUP over an empty input: NO rows (documented deviation —
    # CH/DuckDB emit the grand-total row; pinned r14)
    ("SELECT coalesce(g, -1) AS g, sum(v) AS s FROM (SELECT 1 AS g,"
     " 2 AS v WHERE 1 = 0) GROUP BY g WITH ROLLUP", None),
    # exponentialMovingAverage: the CH docs table's h=1 all-ones
    # series (1 - 2^-k); sorted-fold deviation documented at the shim
    ("SELECT exponentialMovingAverage(1)(v, t) AS e FROM"
     " (SELECT 1.0 AS v, number AS t FROM numbers(3))", (0.875,)),
    ("SELECT exponentialTimeDecayedAvg(1)(v, t) AS e FROM"
     " (SELECT 1.0 AS v, 1 AS t)", None),
    # maxIntersections: the source-pinned tie rule — touching
    # intervals do NOT intersect (end's -1 sorts before start's +1)
    ("SELECT maxIntersections(s, e) AS mi,"
     " maxIntersectionsPosition(s, e) AS mip FROM (SELECT 1 AS s,"
     " 5 AS e UNION ALL SELECT 2, 6 UNION ALL SELECT 4, 7)",
     (3, 4.0)),
    ("SELECT maxIntersections(s, e) AS mi FROM"
     " (SELECT 1 AS s, 2 AS e UNION ALL SELECT 2, 3)", (1,)),
    # LTTB: n <= buckets returns all points sorted by x; the selected
    # shape is pinned vs the canonical reference in tests/test_r14_lttb
    ("SELECT size(largestTriangleThreeBuckets(3)(x, y)) AS n FROM"
     " (SELECT CAST(number AS Float64) AS x,"
     " CAST(number * 3 % 7 AS Float64) AS y FROM numbers(10))", (3,)),
    ("SELECT lttb(10)(x, y) AS r FROM (SELECT 2.0 AS x, 1.0 AS y"
     " UNION ALL SELECT 1.0, 5.0)", None),
    # --- r15: maxIntersections HAVING guard (the inverted combinator
    # check — ADVICE r14 high).  Scalar HAVING keeps the window sweep;
    # a combinator aggregate DECLINES to the fold; both value-exact.
    ("SELECT g, maxIntersections(s, e) AS mi FROM (SELECT 1 AS g,"
     " 1 AS s, 5 AS e UNION ALL SELECT 1, 2, 6 UNION ALL"
     " SELECT 2, 1, 2) t GROUP BY g HAVING g = 1", (1, 2)),
    ("SELECT g, maxIntersections(s, e) AS mi FROM (SELECT 1 AS g,"
     " 1 AS s, 5 AS e UNION ALL SELECT 1, 2, 6 UNION ALL"
     " SELECT 2, 1, 2) t GROUP BY g HAVING countIf(s > 0) >= 2",
     (1, 2)),
    ("SELECT g, maxIntersections(s, e) AS mi FROM (SELECT 1 AS g,"
     " 1 AS s, 5 AS e UNION ALL SELECT 1, 2, 6 UNION ALL"
     " SELECT 2, 1, 2) t GROUP BY g ORDER BY sumIf(s, s > 0) DESC"
     " LIMIT 1", (1, 2)),
    # maxIntersections sweep branches under a set operator (r15 fuzz
    # kind maxint_setop): each branch rewrites independently
    ("SELECT g, maxIntersections(s, e) AS mi FROM (SELECT 1 AS g,"
     " 1 AS s, 5 AS e UNION ALL SELECT 1, 2, 6) t1 GROUP BY g"
     " INTERSECT DISTINCT SELECT g, maxIntersections(s, e) AS mi"
     " FROM (SELECT 1 AS g, 1 AS s, 5 AS e UNION ALL"
     " SELECT 1, 3, 7) t2 GROUP BY g", (1, 2)),
    # exponentialMovingAverage parameter validation (ADVICE r14 low):
    # h = 0 raised by name instead of a silent NaN/Inf fold
    ("SELECT exponentialMovingAverage(0)(v, t) FROM"
     " (SELECT 1.0 AS v, 1 AS t)", UnsupportedChSql),
    # --- r15: uniform chained ASOF folds into ONE keyed window (the
    # fast path); mixed comparators keep the per-link route — both
    # value-pinned on tiny literal sides
    ("SELECT a.v AS v, b.rv AS rv, c.ix AS ix FROM (SELECT 1 AS g,"
     " 10 AS v) AS a ASOF JOIN (SELECT 1 AS g, 8 AS rv) AS b"
     " ON a.g = b.g AND a.v >= b.rv ASOF JOIN (SELECT 1 AS g,"
     " 9 AS ix) AS c ON a.g = c.g AND a.v >= c.ix", (10, 8, 9)),
    ("SELECT a.v AS v, b.rv AS rv, c.ix AS ix FROM (SELECT 1 AS g,"
     " 10 AS v) AS a ASOF JOIN (SELECT 1 AS g, 8 AS rv) AS b"
     " ON a.g = b.g AND a.v >= b.rv ASOF JOIN (SELECT 1 AS g,"
     " 12 AS ix) AS c ON a.g = c.g AND a.v <= c.ix", (10, 8, 12)),
    # r15 fuzz find 151510/144: zip ARRAY JOIN must not rewrite a
    # NESTED block's same-named alias (inner single-array AS u)
    ("SELECT CAST(sum(u + w) AS BIGINT) AS s FROM (SELECT g,"
     " [v, v + 1] AS a, [v + 2, v + 3] AS b FROM (SELECT g, u AS v"
     " FROM (SELECT 1 AS g, [1, 2] AS a) ARRAY JOIN a AS u))"
     " ARRAY JOIN a AS u, b AS w", (24,)),  # DuckDB-confirmed
    # WITH-scope shadowing (r15 fuzz kind): the inner scalar WITH
    # shadows the outer same-named constant inside its subquery
    ("WITH 2 AS kk SELECT v + kk AS v FROM (WITH 7 AS kk"
     " SELECT 10 + kk AS v FROM numbers(1)) x", (19,)),
]


def main() -> int:
    import warnings

    from transaq_clickhouse_exporter_spark.queries.parity import (
        register_derived_views,
    )
    from transaq_clickhouse_exporter_spark.session import get_spark
    from transaq_clickhouse_exporter_spark.testdata import register_views

    spark = get_spark(app="tce-dialect-probe")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    register_views(spark, sf_dir)
    register_derived_views(spark, sf_dir)

    tally: dict[str, list[str]] = {
        "ok-value": [], "ok-run": [], "clean-raise": [],
        "loud-error": [], "SILENT-DIFF": [],
    }
    for sql, expected in CORPUS:
        head = sql.replace("\n", " ")[:72]
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", TopkFallbackWarning)
                rows = run_ch_sql(spark, sql).collect()
        except UnsupportedChSql as e:
            tally["clean-raise"].append(f"{head}  -> {str(e)[:60]}")
            continue
        except Exception as e:
            first = str(e).strip().splitlines()[0][:80]
            tally["loud-error"].append(f"{head}  -> {first}")
            continue
        if expected is None:
            tally["ok-run"].append(head)
            continue
        got = tuple(rows[0]) if rows else ()
        if got == expected:
            tally["ok-value"].append(head)
        else:
            tally["SILENT-DIFF"].append(
                f"{head}  -> got {got!r}, CH documents {expected!r}")

    for cat in ("ok-value", "ok-run", "clean-raise", "loud-error",
                "SILENT-DIFF"):
        print(f"\n== {cat} ({len(tally[cat])}) ==")
        for line in tally[cat]:
            print("  " + line)
    print(f"\ntotal={sum(len(v) for v in tally.values())} corpus={len(CORPUS)}")
    return 1 if tally["SILENT-DIFF"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
