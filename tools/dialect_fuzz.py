#!/usr/bin/env python3
"""Generative differential fuzzer for the CH dialect layer (r12f).

The curated probe corpus (tools/dialect_probe.py) enumerates known
shapes; this generates RANDOM compositions — nested subqueries, UNION
branches, CTEs, bridge tails (PREWHERE / SETTINGS / LIMIT BY /
WITH TOTALS / ARRAY JOIN), quantified subquery comparisons — as
(ClickHouse SQL, DuckDB SQL) MIRROR PAIRS built from constructs whose
translation is value-pinned, then asserts the engines agree on every
generated query.  Seeded and deterministic: a failing seed reproduces
exactly; pytest runs a fixed batch (tests/test_dialect_fuzz.py), this
CLI runs any count.

Mirrors used (each individually value-pinned in the probe corpus):
  numbers(k)            -> (SELECT range AS number FROM range(k))
  PREWHERE p            -> WHERE p            (block has no WHERE)
  SETTINGS ...          -> (dropped)
  ORDER BY o LIMIT n BY g -> QUALIFY row_number() OVER (PARTITION BY
                           g ORDER BY o) <= n  (DuckDB QUALIFY)
  GROUP BY g WITH TOTALS -> GROUP BY ROLLUP(g) (single-key rollup)
  ARRAY JOIN a AS u     -> CROSS JOIN UNNEST(a) AS __un(u)
  x OP ANY/ALL (SELECT ...) -> same text (DuckDB native quantifiers)
  DISTINCT ON (g) ... ORDER BY o -> QUALIFY row_number() = 1
  WITH k AS name SELECT ... name -> inlined constant
  position(hay, needle)          -> position(needle IN hay) (ASCII)

Run: python tools/dialect_fuzz.py [N_QUERIES] [SEED]
Exit 1 on any mismatch; prints the reproducing (seed, index, SQL).
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class Gen:
    """One generated query: parallel CH / DuckDB texts."""

    def __init__(self, rng: random.Random, pptu_clean: bool = False,
                 focus: list[str] | None = None):
        self.rng = rng
        self.n = 0  # fresh-name counter
        self.n_asof = 0  # parallel-branch ASOFs; keep statements small
        #: optional kind names to BIAS toward (50% of block draws);
        #: lets a round's new composition kinds reach the >=100-
        #: compositions-per-kind density without inflating the batch
        self.focus = focus or []
        self.kind_tally: dict[str, int] = {}
        #: True when the running Spark build passed the
        #: PushProjectionThroughUnion probe (ch_compat.spark_pptu_bug
        #: is False): correlated kinds may then draw union-bearing
        #: OUTER sources instead of leaf-only (VERDICT r13 item 4 —
        #: the envelope widens itself on a fixed Spark, no edit).
        self.pptu_clean = pptu_clean

    def corr_outer_source(self, depth: int):
        """Outer source for a correlated-subquery kind: leaf-only on
        a PPTU-buggy build, any block once the probe says clean."""
        if self.pptu_clean:
            c, d = self.block(depth - 1)
            return c, d
        c, d, _ = self.leaf()
        return c, d

    def name(self, p: str) -> str:
        self.n += 1
        return f"{p}{self.n}"

    # ---- leaf sources ------------------------------------------------
    def leaf(self) -> tuple[str, str, list[str]]:
        """Returns (ch, duck, columns).  Columns: g (small group key),
        v (value, sometimes NULL-bearing — NULL ordering now follows
        CH's NULLS LAST default on the engine side, r12g)."""
        k = self.rng.randint(3, 12)
        m = self.rng.randint(2, 4)
        vexpr = "number"
        if self.rng.random() < 0.4:
            nulls_at = self.rng.randint(0, 6)
            vexpr = (f"CASE WHEN number % 7 = {nulls_at} THEN NULL"
                     f" ELSE number END")
        ch = (f"(SELECT number % {m} AS g, {vexpr} AS v"
              f" FROM numbers({k}))")
        duck = (f"(SELECT number % {m} AS g, {vexpr} AS v FROM"
                f" (SELECT range AS number FROM range({k})))")
        return ch, duck, ["g", "v"]

    # ---- block: SELECT over a source with optional bridges ----------
    def block(self, depth: int) -> tuple[str, str]:
        """Returns (ch, duck) for a parenthesized relation producing
        columns (g, v)."""
        if depth <= 0 or self.rng.random() < 0.25:
            ch, duck, _ = self.leaf()
            return ch, duck
        if self.focus and self.rng.random() < 0.5:
            kind = self.rng.choice(self.focus)
        else:
            kind = self.rng.choice(
                ["plain", "plain", "union", "cte", "limit_by", "totals",
                 "array_join", "quantified", "prewhere_settings",
                 "distinct_on", "scalar_with", "grouped", "scalar_wrap",
                 "windowed", "joined", "in_subquery", "arr_wrap",
                 "set_op_distinct", "asof", "qualify", "paginate",
                 "ternary_cast", "quantified_case", "quantified_setop",
                 "correlated_quant", "asof_shared_cte", "rollup",
                 "lag_lead", "seq_next_node", "asof_chain_setop",
                 "ties_setop", "quant_qualify", "array_join_asof",
                 "ema", "max_intersections",
                 # r15 composition kinds (VERDICT r14 item 5)
                 "snn_over_asof", "snn_shared_cte", "maxint_setop",
                 "maxint_having", "with_scope_shadow",
                 # r16 kinds (VERDICT r15 item 5): time-guarded
                 # sequence aggregates, mixed-comparator ASOF chains,
                 # maxIntersections guard-path equivalence
                 "seq_time", "seq_time_match", "seq_time_cte",
                 "asof_multi_mixed", "maxint_guard_paths",
                 # r17 kinds (VERDICT r16 item 7): the r16 rewrite
                 # guards — ASOF right-side pure-dedup accept/decline
                 # paths, maxIntersections parallel-vs-flat under
                 # hostile group keys (anyjoin_defer lives in query())
                 "asof_right_dedup", "maxint_parallel_keys"])
        self.kind_tally[kind] = self.kind_tally.get(kind, 0) + 1
        if kind == "asof" and self.n_asof >= 2:
            kind = "joined"  # cap parallel ASOFs per statement at two
        if kind == "asof_shared_cte" and self.n_asof > 0:
            kind = "joined"  # the shared-CTE kind spends BOTH slots
        if kind == "asof_chain_setop" and self.n_asof > 0:
            kind = "joined"  # the chain spends BOTH slots
        if kind == "array_join_asof" and self.n_asof >= 2:
            kind = "joined"
        if kind == "asof_right_dedup" and self.n_asof >= 2:
            kind = "joined"
        if kind == "union":
            c1, d1 = self.block(depth - 1)
            c2, d2 = self.block(depth - 1)
            return (f"(SELECT g, v FROM {c1} UNION ALL"
                    f" SELECT g, v FROM {c2})",
                    f"(SELECT g, v FROM {d1} UNION ALL"
                    f" SELECT g, v FROM {d2})")
        if kind == "cte":
            nm = self.name("c")
            c1, d1 = self.block(depth - 1)
            # CTE at relation position via a parenthesized WITH body
            return (f"(WITH {nm} AS (SELECT g, v FROM {c1})"
                    f" SELECT g, v FROM {nm})",
                    f"(WITH {nm} AS (SELECT g, v FROM {d1})"
                    f" SELECT g, v FROM {nm})")
        if kind == "limit_by":
            c1, d1 = self.block(depth - 1)
            n = self.rng.randint(1, 2)
            return (f"(SELECT g, v FROM {c1} ORDER BY g, v"
                    f" LIMIT {n} BY g)",
                    f"(SELECT g, v FROM {d1} QUALIFY row_number()"
                    f" OVER (PARTITION BY g ORDER BY g, v) <= {n})")
        if kind == "totals":
            c1, d1 = self.block(depth - 1)
            # TOTALS row carries NULL g; coalesce keys to keep the
            # outer aggregation NULL-free and deterministic.  The
            # HAVING count(*) > 0 guard mirrors the bridge's
            # documented empty-input contract: NO totals row over an
            # empty input (Spark grouping-sets semantics) — first
            # fuzz run caught the ROLLUP mirror emitting the
            # grand-total row there
            return (f"(SELECT coalesce(g, -1) AS g,"
                    f" coalesce(sv, 0) AS v FROM (SELECT g,"
                    f" sum(v) AS sv FROM {c1} GROUP BY g WITH TOTALS))",
                    f"(SELECT coalesce(g, -1) AS g,"
                    f" coalesce(sv, 0) AS v FROM (SELECT g,"
                    f" sum(v) AS sv FROM {d1} GROUP BY ROLLUP(g)"
                    f" HAVING count(*) > 0))")
        if kind == "array_join":
            c1, d1 = self.block(depth - 1)
            if self.rng.random() < 0.35:
                # multi-array LOCKSTEP zip (r13: the widened form) —
                # both arrays length 2, so the DuckDB mirror indexes
                # a fixed 1..2 spine (DuckDB lists are 1-indexed)
                return (
                    f"(SELECT g, u + w AS v FROM (SELECT g,"
                    f" [v, v + 1] AS a, [v + 2, v + 3] AS b"
                    f" FROM {c1}) ARRAY JOIN a AS u, b AS w)",
                    f"(SELECT g, a[i] + b[i] AS v FROM (SELECT g,"
                    f" [v, v + 1] AS a, [v + 2, v + 3] AS b"
                    f" FROM {d1}) AS __mj CROSS JOIN"
                    f" UNNEST(generate_series(1, 2)) AS __sp(i))")
            return (f"(SELECT g, u AS v FROM (SELECT g,"
                    f" [v, v + 1] AS a FROM {c1}) ARRAY JOIN a AS u)",
                    f"(SELECT g, u AS v FROM (SELECT g,"
                    f" [v, v + 1] AS a FROM {d1}) AS __aj"
                    f" CROSS JOIN UNNEST(a) AS __un(u))")
        if kind == "quantified":
            c1, d1 = self.block(depth - 1)
            c2, d2 = self.block(depth - 1)
            op = self.rng.choice([">", ">=", "<", "<=", "=", "!="])
            q = self.rng.choice(["ANY", "ALL"])
            if (op, q) in ((" =", "ALL"),):
                op = ">"
            return (f"(SELECT g, v FROM {c1} WHERE v {op} {q}"
                    f" (SELECT v + 2 FROM {c2}))",
                    f"(SELECT g, v FROM {d1} WHERE v {op} {q}"
                    f" (SELECT v + 2 FROM {d2}))")
        if kind == "distinct_on":
            c1, d1 = self.block(depth - 1)
            return (f"(SELECT DISTINCT ON (g) g, v FROM {c1}"
                    f" ORDER BY g, v)",
                    f"(SELECT g, v FROM {d1} QUALIFY row_number()"
                    f" OVER (PARTITION BY g ORDER BY g, v) = 1)")
        if kind == "scalar_with":
            c1, d1 = self.block(depth - 1)
            k = self.rng.randint(2, 5)
            return (f"(WITH {k} AS __fk SELECT g, v * __fk AS v"
                    f" FROM {c1})",
                    f"(SELECT g, v * {k} AS v FROM {d1})")
        if kind == "grouped":
            c1, d1 = self.block(depth - 1)
            having_t = self.rng.randint(0, 8)
            hv = (f" HAVING sum(v) > {having_t}"
                  if self.rng.random() < 0.5 else "")
            # inner aliases MUST NOT shadow the source columns: CH
            # resolves aliases over columns (prefer_column_name_to_
            # alias = 0), so `sum(v) AS v ... HAVING sum(v)` nests
            # the aggregate and errors on BOTH engines' semantics —
            # the dialect reproduces CH's alias-wins rule (first
            # extended-fuzz run caught the shadowed spelling)
            ch = (f"(SELECT g2 AS g, v2 AS v FROM (SELECT g % 2 AS"
                  f" g2, CAST(sum(v) AS BIGINT) AS v2 FROM {c1}"
                  f" GROUP BY g % 2{hv}))")
            return ch, ch.replace(c1, d1)
        if kind == "scalar_wrap":
            c1, d1 = self.block(depth - 1)
            # CH position(haystack, needle) is byte-based == DuckDB's
            # ANSI position on ASCII digit strings
            return (f"(SELECT g, v + position(toString(v), '1') AS v"
                    f" FROM {c1})",
                    f"(SELECT g, v + position('1' IN"
                    f" CAST(v AS VARCHAR)) AS v FROM {d1})")
        if kind == "windowed":
            c1, d1 = self.block(depth - 1)
            # Running sum over ORDER BY v inside g: ties in v within a
            # partition can only come from IDENTICAL (g, v) rows (the
            # block schema is exactly g, v), so any tie order yields
            # the same output MULTISET — and the comparison sorts.
            # NULL placement: the r12g contract appends NULLS LAST
            # inside OVER on the CH side; DuckDB's default null order
            # is NULLS LAST in both directions, so the mirror needs no
            # explicit modifier.  NULL v rows contribute 0 (sum skips
            # NULL) and land last on both engines.
            win = self.rng.choice(["run_sum", "dense_rank"])
            if win == "run_sum":
                expr = ("CAST(sum(v) OVER (PARTITION BY g ORDER BY v"
                        " ROWS BETWEEN UNBOUNDED PRECEDING AND"
                        " CURRENT ROW) AS BIGINT)")
                return (f"(SELECT g, {expr} AS v FROM {c1})",
                        f"(SELECT g, {expr} AS v FROM {d1})")
            expr = ("CAST(dense_rank() OVER (PARTITION BY g"
                    " ORDER BY v) AS BIGINT)")
            return (f"(SELECT g, {expr} AS v FROM {c1})",
                    f"(SELECT g, {expr} AS v FROM {d1})")
        if kind == "joined":
            # INNER equi-join on g: identical ANSI semantics on both
            # engines (CH's default-fill divergence is LEFT-only).
            c1, d1 = self.block(depth - 1)
            c2, d2 = self.block(depth - 1)
            t1, t2 = self.name("j"), self.name("j")
            sel = f"SELECT {t1}.g AS g, {t1}.v + {t2}.v AS v FROM"
            on = f"ON {t1}.g = {t2}.g"
            return (f"({sel} {c1} AS {t1} INNER JOIN {c2} AS {t2} {on})",
                    f"({sel} {d1} AS {t1} INNER JOIN {d2} AS {t2} {on})")
        if kind == "in_subquery":
            # Positive IN only: in WHERE (filter context) CH's
            # NULL-IN-is-0 rule and ANSI's NULL both reject the row,
            # so the engines agree; NOT IN with a NULL-bearing set
            # genuinely diverges (CH keeps, ANSI drops) and is pinned
            # in the probe corpus, not fuzzed.
            c1, d1 = self.block(depth - 1)
            c2, d2 = self.block(depth - 1)
            return (f"(SELECT g, v FROM {c1} WHERE v IN"
                    f" (SELECT v + 1 FROM {c2}))",
                    f"(SELECT g, v FROM {d1} WHERE v IN"
                    f" (SELECT v + 1 FROM {d2}))")
        if kind == "arr_wrap":
            # Array HOF composition over NULL-free inputs (g is never
            # NULL): arrayMap -> transform, arraySum -> the aggregate
            # shim.  Result is 2g + 4, kept integral via the CAST.
            c1, d1 = self.block(depth - 1)
            return (f"(SELECT g, v + CAST(arraySum(arrayMap("
                    f"x -> x + 1, [g, g + 2])) AS BIGINT) AS v"
                    f" FROM {c1})",
                    f"(SELECT g, v + CAST(list_sum(list_transform("
                    f"[g, g + 2], x -> x + 1)) AS BIGINT) AS v"
                    f" FROM {d1})")
        if kind == "set_op_distinct":
            # CH's explicit DISTINCT set-op spellings are the only
            # value-equal pass-throughs (bare/ALL raise by name: CH
            # keeps left duplicates); DuckDB's bare forms ARE the
            # DISTINCT forms
            c1, d1 = self.block(depth - 1)
            c2, d2 = self.block(depth - 1)
            op = self.rng.choice(["INTERSECT", "EXCEPT"])
            return (f"(SELECT g, v FROM {c1} {op} DISTINCT"
                    f" SELECT g, v FROM {c2})",
                    f"(SELECT g, v FROM {d1} {op}"
                    f" SELECT g, v FROM {d2})")
        if kind == "asof":
            # CTE-sided ASOF LEFT JOIN (r12h): both sides coalesced
            # NULL-free (CH disallows Nullable ASOF columns), right
            # ts shifted +1 so matches are non-trivial; DuckDB's
            # native ASOF JOIN is the mirror verbatim.  Duplicate
            # (g, rv) right rows are harmless: the matched payload is
            # rv itself, so any tie pick yields the same value.
            self.n_asof += 1
            c1, d1 = self.block(depth - 1)
            c2, d2 = self.block(depth - 1)
            al, ar = self.name("al"), self.name("ar")
            form = self.rng.choice(["cte", "subq", "using", "chain"])
            if form == "chain" and self.n_asof >= 2:
                form = "subq"  # a chain spends the second slot too
            if form == "chain":
                # CHAINED ASOF (r13): link 2's left side is link 1's
                # result; DuckDB parses the same text left-assoc.
                # Sides NULL-free; +1/+2 shifts keep matches partial.
                self.n_asof += 1
                c3, d3 = self.block(0)
                ac = self.name("ac")
                tpl = (
                    f"(SELECT {al}.g AS g, {al}.v +"
                    f" coalesce({ar}.rv, 0) + coalesce({ac}.ix, 0)"
                    f" AS v FROM (SELECT g, coalesce(v, 0) AS v"
                    f" FROM {{s1}}) AS {al}"
                    f" ASOF LEFT JOIN (SELECT g, coalesce(v, 0) + 1"
                    f" AS rv FROM {{s2}}) AS {ar}"
                    f" ON {al}.g = {ar}.g AND {al}.v >= {ar}.rv"
                    f" ASOF LEFT JOIN (SELECT g, coalesce(v, 0) + 2"
                    f" AS ix FROM {{s3}}) AS {ac}"
                    f" ON {al}.g = {ac}.g AND {al}.v >= {ac}.ix)")
                return (tpl.format(s1=c1, s2=c2, s3=c3),
                        tpl.format(s1=d1, s2=d2, s3=d3))
            if form == "cte":
                tpl = (f"(WITH {al} AS (SELECT g, coalesce(v, 0) AS v"
                       f" FROM {{src1}}),"
                       f" {ar} AS (SELECT g, coalesce(v, 0) + 1 AS rv"
                       f" FROM {{src2}})"
                       f" SELECT {al}.g AS g, v + coalesce(rv, 0) AS v"
                       f" FROM {al} ASOF LEFT JOIN {ar}"
                       f" ON {al}.g = {ar}.g AND {al}.v >= {ar}.rv)")
            elif form == "subq":
                # parenthesized subquery sides (r12i)
                tpl = (f"(SELECT {al}.g AS g, {al}.v +"
                       f" coalesce({ar}.rv, 0) AS v"
                       f" FROM (SELECT g, coalesce(v, 0) AS v"
                       f" FROM {{src1}}) AS {al}"
                       f" ASOF LEFT JOIN (SELECT g, coalesce(v, 0) + 1"
                       f" AS rv FROM {{src2}}) AS {ar}"
                       f" ON {al}.g = {ar}.g AND {al}.v >= {ar}.rv)")
            else:
                # USING (k, ts): last column is the fixed >= asof key;
                # bare v in the projection is the LEFT side's value on
                # both engines, the qualified {ar}.v the matched one
                tpl = (f"(SELECT {al}.g AS g, {al}.v + {ar}.v AS v"
                       f" FROM (SELECT g, coalesce(v, 0) AS v"
                       f" FROM {{src1}}) AS {al}"
                       f" ASOF JOIN (SELECT g, coalesce(v, 0) AS v"
                       f" FROM {{src2}}) AS {ar}"
                       f" USING (g, v))")
            return (tpl.format(src1=c1, src2=c2),
                    tpl.format(src1=d1, src2=d2))
        if kind == "asof_right_dedup":
            # ASOF right side that is (or ALMOST is) a pure per-row
            # dedup of the shared duplicate-bearing table fz_dup
            # (created on both engines by run_fuzz): accept variants
            # take the r16 `_asof_right_sans_distinct` GROUP BY drop,
            # decline variants (aggregate item / qualified columns /
            # HAVING) keep the dedup — DuckDB runs the same text, so
            # every path must agree (VERDICT r16 item 7).
            self.n_asof += 1
            c1, d1 = self.block(depth - 1)
            al, ar = self.name("al"), self.name("ar")
            j = self.rng.randint(0, 2)
            variant = self.rng.choice(
                ["accept", "accept_where", "accept_pos",
                 "decl_agg", "decl_qual", "decl_having"])
            bodies = {
                "accept": ("SELECT g, rv FROM fz_dup GROUP BY g, rv",) * 2,
                "accept_where": ((f"SELECT g, rv FROM fz_dup WHERE"
                                  f" rv % 3 <> {j} GROUP BY rv, g"),) * 2,
                "accept_pos": ("SELECT g, rv FROM fz_dup"
                               " GROUP BY 2, 1",) * 2,
                "decl_agg": ("SELECT g, max(rv) AS rv FROM fz_dup"
                             " GROUP BY g",) * 2,
                "decl_qual": ("SELECT fz_dup.g, fz_dup.rv FROM fz_dup"
                              " GROUP BY fz_dup.g, fz_dup.rv",) * 2,
                "decl_having": (
                    "SELECT g, rv FROM fz_dup GROUP BY g, rv"
                    " HAVING count() >= 1",
                    "SELECT g, rv FROM fz_dup GROUP BY g, rv"
                    " HAVING count(*) >= 1"),
            }
            rb_ch, rb_duck = bodies[variant]
            tpl = ("(SELECT {al}.g AS g, {al}.v +"
                   " coalesce({ar}.rv, 0) AS v"
                   " FROM (SELECT g, coalesce(v, 0) AS v"
                   " FROM {src}) AS {al}"
                   " ASOF LEFT JOIN ({rb}) AS {ar}"
                   " ON {al}.g = {ar}.g AND {al}.v >= {ar}.rv)")
            return (tpl.format(al=al, ar=ar, src=c1, rb=rb_ch),
                    tpl.format(al=al, ar=ar, src=d1, rb=rb_duck))
        if kind == "maxint_parallel_keys":
            # maxIntersections under group keys HOSTILE to the r16
            # parallel two-level prefix sum: plain/qualified keys take
            # the parallel path, an expression key or a __mi_-prefixed
            # output name must DECLINE to the flat one-window sweep —
            # both must equal the DuckDB event-sweep mirror (VERDICT
            # r16 item 7).
            c1, d1 = self.block(depth - 1)
            m1, m2 = self.rng.randint(5, 15), self.rng.randint(1, 4)
            call = (f"maxIntersections(coalesce(v, 0) % {m1},"
                    f" coalesce(v, 0) % {m1} + 1 +"
                    f" coalesce(v, 0) % {m2})")
            pair = (f"coalesce(v, 0) % {m1} AS s, coalesce(v, 0) %"
                    f" {m1} + 1 + coalesce(v, 0) % {m2} AS e")
            variant = self.rng.choice(
                ["plain", "qualified", "expr", "mi_prefix"])
            q = self.name("mq")
            if variant == "plain":
                ch = (f"(SELECT g, CAST({call} AS BIGINT) AS v"
                      f" FROM {c1} {q} GROUP BY g)")
                inner = f"SELECT g AS gk, {pair} FROM {d1} {q}"
            elif variant == "qualified":
                ch = (f"(SELECT {q}.g AS g, CAST({call} AS BIGINT) AS v"
                      f" FROM {c1} AS {q} GROUP BY {q}.g)")
                inner = f"SELECT {q}.g AS gk, {pair} FROM {d1} AS {q}"
            elif variant == "expr":
                ch = (f"(SELECT g % 2 AS g, CAST({call} AS BIGINT) AS v"
                      f" FROM {c1} {q} GROUP BY g % 2)")
                inner = f"SELECT g % 2 AS gk, {pair} FROM {d1} {q}"
            else:  # mi_prefix: output name collides with the rewrite's
                ch = (f"(SELECT __mi_g AS g, CAST({call} AS BIGINT) AS v"
                      f" FROM (SELECT g AS __mi_g, v FROM {c1}) {q}"
                      f" GROUP BY __mi_g)")
                inner = (f"SELECT __mi_g AS gk, {pair} FROM"
                         f" (SELECT g AS __mi_g, v FROM {d1}) {q}")
            pt, rn = self.name("mp"), self.name("mr")
            duck = (
                f"(WITH {pt} AS (SELECT gk, u.p AS p, u.w AS w FROM"
                f" ({inner}) AS __mi,"
                f" UNNEST([struct_pack(p := s::DOUBLE, w := 1),"
                f" struct_pack(p := e::DOUBLE, w := -1)]) AS t(u)),"
                f" {rn} AS (SELECT gk, sum(w) OVER (PARTITION BY gk"
                f" ORDER BY p, w ROWS UNBOUNDED PRECEDING) AS c"
                f" FROM {pt})"
                f" SELECT gk AS g, CAST(max(c) AS BIGINT) AS v"
                f" FROM {rn} GROUP BY gk)")
            return ch, duck
        if kind == "rollup":
            # GROUP BY … WITH ROLLUP passes through (Spark's ANSI
            # NULL subtotal keys == DuckDB's ROLLUP; CH's
            # type-default keys are the documented deviation, not
            # fuzzed).  Keys coalesced so the (g, v) schema stays
            # NULL-free downstream.  The HAVING count(*) > 0 guard
            # mirrors the documented empty-input contract (same as
            # the totals kind): Spark grouping sets emit NO rows over
            # an empty input where DuckDB emits the grand-total row —
            # seed 7106/1 composed an always-false correlated filter
            # under ROLLUP and exposed the unguarded mirror (engine
            # deviation already module-documented, not a bridge bug).
            c1, d1 = self.block(depth - 1)
            return (f"(SELECT coalesce(g, -1) AS g,"
                    f" coalesce(CAST(sum(v) AS BIGINT), -9) AS v"
                    f" FROM {c1} GROUP BY g WITH ROLLUP)",
                    f"(SELECT coalesce(g, -1) AS g,"
                    f" coalesce(CAST(sum(v) AS BIGINT), -9) AS v"
                    f" FROM {d1} GROUP BY ROLLUP(g)"
                    f" HAVING count(*) > 0)")
        if kind == "lag_lead":
            # lagInFrame/leadInFrame → lag/lead with the full-frame
            # idiom stripped (r11 bridge).  Ties in (g, v) are
            # identical rows, so the lag/lead value multiset is
            # order-invariant; NULL v rows sort last on both engines
            # (r12g NULLS LAST normalization).
            c1, d1 = self.block(depth - 1)
            fn = self.rng.choice(["lagInFrame", "leadInFrame"])
            dfn = "lag" if fn == "lagInFrame" else "lead"
            ch = (f"(SELECT g, CAST(coalesce({fn}(v) OVER ("
                  f"PARTITION BY g ORDER BY v ROWS BETWEEN UNBOUNDED"
                  f" PRECEDING AND UNBOUNDED FOLLOWING), -1)"
                  f" AS BIGINT) AS v FROM {c1})")
            duck = (f"(SELECT g, CAST(coalesce({dfn}(v) OVER ("
                    f"PARTITION BY g ORDER BY v), -1) AS BIGINT)"
                    f" AS v FROM {d1})")
            return ch, duck
        if kind == "ema":
            # exponentialMovingAverage (r14 drain): sorted-(t, v)
            # fold, h=1 so every exponent is an integer and pow(2, k)
            # is exact on both engines — the fold doubles are then
            # bit-identical and floor(x * 4096) re-enters the integer
            # (g, v) contract.  Time := coalesce(v, 0) (ties add,
            # like CH merge at equal times); DuckDB mirror replays
            # the identical fold via list ORDER BY + list_reduce.
            c1, d1 = self.block(depth - 1)
            m = self.rng.randint(3, 9)
            a = self.name("ea")
            ch = (f"(SELECT g, CAST(floor(exponentialMovingAverage(1)"
                  f"(CAST(coalesce(v, 0) % {m} AS Float64),"
                  f" coalesce(v, 0)) * 4096) AS Int64) AS v"
                  f" FROM {c1} GROUP BY g)")
            duck = (f"(WITH {a} AS (SELECT g,"
                    f" list(struct_pack(t := coalesce(v, 0)::DOUBLE,"
                    f" v := (coalesce(v, 0) % {m})::DOUBLE)"
                    f" ORDER BY coalesce(v, 0)::DOUBLE,"
                    f" (coalesce(v, 0) % {m})::DOUBLE) AS arr"
                    f" FROM {d1} GROUP BY g)"
                    f" SELECT g, CAST(floor(list_reduce("
                    f"list_transform(arr, x -> struct_pack(s := x.v,"
                    f" t := x.t)), (acc, x) -> struct_pack(s := x.s +"
                    f" acc.s * pow(2.0::DOUBLE, (acc.t - x.t) /"
                    f" 1.0::DOUBLE), t := x.t)).s * (1.0::DOUBLE -"
                    f" pow(2.0::DOUBLE, -1.0::DOUBLE)) * 4096)"
                    f" AS BIGINT) AS v FROM {a})")
            return ch, duck
        if kind == "max_intersections":
            # maxIntersections(/Position) (r14 drain): integer sweep
            # over synthetic [s, s+d) intervals from (g, v); the CH
            # tie rule (ends before starts at equal positions) is
            # source-pinned, mirrored by ORDER BY p, w.  Packs both
            # answers into one integer (mi * 1000 + position) to
            # re-enter the (g, v) contract.
            c1, d1 = self.block(depth - 1)
            m1, m2 = self.rng.randint(5, 15), self.rng.randint(1, 4)
            pt, rn2, mx2 = self.name("mp"), self.name("mr"), self.name("mm")
            if self.rng.random() < 0.5:
                # bare-call select items take the r14 WINDOW-sweep
                # rewrite; the packed arithmetic form below declines
                # to the fold — both paths stay fuzzed
                ch = (f"(SELECT g, maxIntersections(coalesce(v, 0)"
                      f" % {m1}, coalesce(v, 0) % {m1} + 1 +"
                      f" coalesce(v, 0) % {m2}) AS v"
                      f" FROM {c1} GROUP BY g)")
                duck = (
                    f"(WITH {pt} AS (SELECT g, u.p AS p, u.w AS w FROM"
                    f" (SELECT g, coalesce(v, 0) % {m1} AS s,"
                    f" coalesce(v, 0) % {m1} + 1 + coalesce(v, 0) %"
                    f" {m2} AS e FROM {d1}) AS __mi,"
                    f" UNNEST([struct_pack(p := s::DOUBLE, w := 1),"
                    f" struct_pack(p := e::DOUBLE, w := -1)]) AS t(u)),"
                    f" {rn2} AS (SELECT g, sum(w) OVER (PARTITION"
                    f" BY g ORDER BY p, w ROWS UNBOUNDED PRECEDING)"
                    f" AS c FROM {pt})"
                    f" SELECT g, CAST(max(c) AS BIGINT) AS v"
                    f" FROM {rn2} GROUP BY g)")
                return ch, duck
            ch = (f"(SELECT g, CAST(maxIntersections(coalesce(v, 0)"
                  f" % {m1}, coalesce(v, 0) % {m1} + 1 + coalesce(v,"
                  f" 0) % {m2}) * 1000 +"
                  f" maxIntersectionsPosition(coalesce(v, 0) % {m1},"
                  f" coalesce(v, 0) % {m1} + 1 + coalesce(v, 0) %"
                  f" {m2}) AS Int64) AS v FROM {c1} GROUP BY g)")
            duck = (
                f"(WITH {pt} AS (SELECT g, u.p AS p, u.w AS w FROM"
                f" (SELECT g, coalesce(v, 0) % {m1} AS s,"
                f" coalesce(v, 0) % {m1} + 1 + coalesce(v, 0) % {m2}"
                f" AS e FROM {d1}) AS __mi,"
                f" UNNEST([struct_pack(p := s::DOUBLE, w := 1),"
                f" struct_pack(p := e::DOUBLE, w := -1)]) AS t(u)),"
                f" {rn2} AS (SELECT g, p, w, sum(w) OVER (PARTITION"
                f" BY g ORDER BY p, w ROWS UNBOUNDED PRECEDING) AS c,"
                f" row_number() OVER (PARTITION BY g ORDER BY p, w)"
                f" AS rn FROM {pt}),"
                f" {mx2} AS (SELECT g, max(c) AS m FROM {rn2}"
                f" GROUP BY g)"
                f" SELECT r.g AS g, CAST(x.m * 1000 +"
                f" arg_min(r.p, r.rn) AS BIGINT) AS v"
                f" FROM {rn2} r JOIN {mx2} x ON x.g = r.g AND"
                f" r.c = x.m GROUP BY r.g, x.m)")
            return ch, duck
        if kind == "seq_time":
            # time-guarded sequenceCount (r16): the greedy chain fold
            # vs an INDEPENDENT DuckDB recursive-CTE greedy scan (min
            # end index per step >= scan_from, resume after it) — the
            # ev33 oracle technique parameterized over random
            # separators, guard operators and conditions.
            c1, d1 = self.block(depth - 1)
            return self._seq_time_over(c1, d1, match_only=False)
        if kind == "seq_time_match":
            # guarded sequenceMatch as Int (r16): existence via a
            # plain 2-way self-join EXISTS — a second independent
            # mirror shape next to the recursive count.
            c1, d1 = self.block(depth - 1)
            return self._seq_time_over(c1, d1, match_only=True)
        if kind == "seq_time_cte":
            # guarded sequence aggregate over a statement-level CTE
            # that is ALSO consumed by a plain aggregate branch (r16):
            # the shared def must survive the fold rewrite's source
            # wrap (same hazard zone as snn_shared_cte).
            nm = self.name("stc")
            c1, d1 = self.block(depth - 1)
            st_ch, st_duck = self._seq_time_over(
                nm, nm, match_only=self.rng.random() < 0.5)
            ch = (f"(WITH {nm} AS (SELECT g, v FROM {c1})"
                  f" SELECT g, v FROM {st_ch} __st"
                  f" UNION ALL SELECT g, CAST(sum(v) AS BIGINT) AS v"
                  f" FROM {nm} GROUP BY g)")
            duck = (f"(WITH {nm} AS (SELECT g, v FROM {d1})"
                    f" SELECT g, v FROM {st_duck} __st"
                    f" UNION ALL SELECT g, CAST(sum(v) AS BIGINT) AS v"
                    f" FROM {nm} GROUP BY g)")
            return ch, duck
        if kind == "asof_multi_mixed":
            # chained ASOF with PER-LINK comparators drawn from
            # {>=, >} (r16): a uniform draw takes the asof_multi
            # single-window fast path, a mixed draw the per-link
            # fallback — both must equal DuckDB's native ASOF chain,
            # which parses the same text verbatim.
            if self.n_asof >= 1:
                c1, d1 = self.block(depth - 1)
                return self._seq_time_over(c1, d1, match_only=True)
            self.n_asof += 2
            c1, d1 = self.block(0)
            c2, d2 = self.block(0)
            c3, d3 = self.block(0)
            op1 = self.rng.choice([">=", ">"])
            op2 = self.rng.choice([">=", ">"])
            al, ar, ac = self.name("ml"), self.name("mr"), self.name("mc")
            tpl = (f"(SELECT {al}.g AS g, {al}.v +"
                   f" coalesce({ar}.rv, 0) + coalesce({ac}.ix, 0)"
                   f" AS v FROM (SELECT g, coalesce(v, 0) AS v"
                   f" FROM {{s1}}) AS {al}"
                   f" ASOF LEFT JOIN (SELECT g, coalesce(v, 0) + 1"
                   f" AS rv FROM {{s2}}) AS {ar}"
                   f" ON {al}.g = {ar}.g AND {al}.v {op1} {ar}.rv"
                   f" ASOF LEFT JOIN (SELECT g, coalesce(v, 0) + 2"
                   f" AS ix FROM {{s3}}) AS {ac}"
                   f" ON {al}.g = {ac}.g AND {al}.v {op2} {ac}.ix)")
            return (tpl.format(s1=c1, s2=c2, s3=c3),
                    tpl.format(s1=d1, s2=d2, s3=d3))
        if kind == "maxint_guard_paths":
            # maxIntersections with a HAVING whose scalar calls either
            # PASS the known-scalar guard (abs/floor — window-sweep
            # rewrite) or DECLINE it (ascii — always-correct fold):
            # both paths must produce the sweep's values (r16, the
            # ADVICE arrayJoin/arrayReduce guard audit generalized).
            c1, d1 = self.block(depth - 1)
            m1, m2 = self.rng.randint(5, 15), self.rng.randint(1, 4)
            # always-true HAVING tail so values are unaffected; the
            # call CHOICE flips which rewrite path runs: group-key
            # scalars (abs/floor, known) keep the window sweep, an
            # unknown call (ascii) declines to the fold
            guard_pass = self.rng.random() < 0.5
            tail = ("abs(floor(g)) >= 0"
                    if guard_pass else "ascii('a') = 97")
            pt, rn2 = self.name("gp"), self.name("gr")
            ch = (f"(SELECT g, maxIntersections(coalesce(v, 0)"
                  f" % {m1}, coalesce(v, 0) % {m1} + 1 +"
                  f" coalesce(v, 0) % {m2}) AS v"
                  f" FROM {c1} GROUP BY g HAVING {tail})")
            duck = (
                f"(WITH {pt} AS (SELECT g, u.p AS p, u.w AS w FROM"
                f" (SELECT g, coalesce(v, 0) % {m1} AS s,"
                f" coalesce(v, 0) % {m1} + 1 + coalesce(v, 0) %"
                f" {m2} AS e FROM {d1}) AS __mi,"
                f" UNNEST([struct_pack(p := s::DOUBLE, w := 1),"
                f" struct_pack(p := e::DOUBLE, w := -1)]) AS t(u)),"
                f" {rn2} AS (SELECT g, sum(w) OVER (PARTITION"
                f" BY g ORDER BY p, w ROWS UNBOUNDED PRECEDING)"
                f" AS c FROM {pt})"
                f" SELECT g, CAST(max(c) AS BIGINT) AS v"
                f" FROM {rn2} GROUP BY g)")
            return ch, duck
        if kind == "seq_next_node":
            # sequenceNextNode (r14, VERDICT r13 item 5): both
            # supported base modes over a DISTINCT-deduped source —
            # ts := v must be unique per group because the bridge
            # RAISES on duplicate timestamps (CH node order is
            # undefined there); DISTINCT (g, v) guarantees it even
            # for union-built sources.  Mirror: row_number window +
            # rn-offset self-joins; NULL v rows drop on both sides
            # (NULL ts never becomes a node).  The string event
            # column round-trips CAST(v AS String) → BIGINT exactly.
            c1, d1 = self.block(depth - 1)
            return self._snn_over(c1, d1)
        if kind == "snn_over_asof":
            # sequenceNextNode WHOSE SOURCE IS AN ASOF JOIN (r15,
            # VERDICT r14 item 5): the ASOF bridge consumes the
            # FROM…JOIN region BEFORE translate; the seqNextNode
            # rewrite must then see the bridged view cleanly.  DuckDB
            # parses the same ASOF text natively.
            if self.n_asof >= 2:
                c1, d1 = self.block(depth - 1)
                return self._snn_over(c1, d1)
            self.n_asof += 1
            c1, d1 = self.block(0)
            c2, d2 = self.block(0)
            al, ar = self.name("al"), self.name("ar")
            tpl = (f"(SELECT {al}.g AS g, {al}.v +"
                   f" coalesce({ar}.rv, 0) AS v"
                   f" FROM (SELECT g, coalesce(v, 0) AS v"
                   f" FROM {{s1}}) AS {al}"
                   f" ASOF LEFT JOIN (SELECT g, coalesce(v, 0) + 1"
                   f" AS rv FROM {{s2}}) AS {ar}"
                   f" ON {al}.g = {ar}.g AND {al}.v >= {ar}.rv)")
            return self._snn_over(tpl.format(s1=c1, s2=c2),
                                  tpl.format(s1=d1, s2=d2))
        if kind == "snn_shared_cte":
            # sequenceNextNode over a statement-level CTE that is
            # ALSO consumed by a plain aggregate branch (r15): the
            # shared def must survive the seqNextNode rewrite's
            # source wrap (the InlineCTE / shared-def hazard zone).
            nm = self.name("sc")
            c1, d1 = self.block(depth - 1)
            snn_ch, snn_duck = self._snn_over(nm, nm)
            ch = (f"(WITH {nm} AS (SELECT g, v FROM {c1})"
                  f" SELECT g, v FROM {snn_ch} __sn"
                  f" UNION ALL SELECT g, CAST(sum(v) AS BIGINT) AS v"
                  f" FROM {nm} GROUP BY g)")
            duck = (f"(WITH {nm} AS (SELECT g, v FROM {d1})"
                    f" SELECT g, v FROM {snn_duck} __sn"
                    f" UNION ALL SELECT g, CAST(sum(v) AS BIGINT) AS v"
                    f" FROM {nm} GROUP BY g)")
            return ch, duck
        if kind == "maxint_setop":
            # maxIntersections window-sweep blocks under set
            # operators (r15, VERDICT r14 item 5): each branch must
            # rewrite independently and the set op must apply to the
            # FINISHED aggregates, not the exploded rows.
            c1, d1 = self.block(depth - 1)
            c2, d2 = self.block(depth - 1)
            setop = self.rng.choice(["UNION ALL", "INTERSECT", "EXCEPT"])
            ch_setop = (setop if setop == "UNION ALL"
                        else setop + " DISTINCT")
            ch = f"({self._mi_ch(c1)} {ch_setop} {self._mi_ch(c2)})"
            duck = f"({self._mi_duck(d1)} {setop} {self._mi_duck(d2)})"
            return ch, duck
        if kind == "maxint_having":
            # maxIntersections + HAVING (r15): a combinator aggregate
            # (countIf) in HAVING must DECLINE the sweep (this round's
            # inverted guard — the explode doubles row multiplicity),
            # while a scalar HAVING keeps it; BOTH must match the
            # mirror, which computes HAVING over the base rows.
            c1, d1 = self.block(depth - 1)
            # the source column is RENAMED vv: aliasing the call AS v
            # while HAVING references source v would make the alias
            # shadow the column (CH alias-visibility), inlining an
            # aggregate inside countIf — invalid SQL on BOTH engines
            # (first r15 fuzz run generated exactly that)
            if self.rng.random() < 0.5:
                hv_ch = "countIf(vv % 2 = 0) >= 1"
                hv_duck = ("count(*) FILTER (WHERE coalesce(v, 0)"
                           " % 2 = 0) >= 1")
            else:
                hv_ch, hv_duck = "g >= 1", "g >= 1"
            hsrc = self.name("hs")
            ch = (f"(SELECT g, maxIntersections(vv, vv + g + 2) AS v"
                  f" FROM (SELECT g, coalesce(v, 0) AS vv FROM {c1}"
                  f" __hi{hsrc}) {hsrc} GROUP BY g HAVING {hv_ch})")
            duck = (f"(SELECT a.g AS g, a.v AS v"
                    f" FROM {self._mi_duck(d1)} a JOIN"
                    f" (SELECT g FROM {d1} __hb GROUP BY g"
                    f" HAVING {hv_duck}) f ON f.g = a.g)")
            return ch, duck
        if kind == "with_scope_shadow":
            # nested WITH-scope shadowing (r15, VERDICT r14 item 5):
            # an inner WITH redefines an outer name; the scalar-WITH
            # inliner / CTE handling must bind each reference to its
            # NEAREST enclosing definition.  Relation form ships the
            # same text to DuckDB (native scoping); the scalar form
            # mirrors with the constants inlined by hand.
            c1, d1 = self.block(depth - 1)
            if self.rng.random() < 0.5:
                k1 = self.rng.randint(2, 5)
                k2 = self.rng.randint(6, 9)
                ch = (f"(WITH {k1} AS kk SELECT g, v + kk AS v FROM"
                      f" (WITH {k2} AS kk SELECT g, coalesce(v, 0)"
                      f" + kk AS v FROM {c1}) __sw)")
                duck = (f"(SELECT g, v + {k1} AS v FROM"
                        f" (SELECT g, coalesce(v, 0) + {k2} AS v"
                        f" FROM {d1}) __sw)")
                return ch, duck
            nm = self.name("w")
            c2, d2 = self.block(0)
            tpl = (f"(WITH {nm} AS (SELECT g, coalesce(v, 0) AS v"
                   f" FROM {{s1}})"
                   f" SELECT o.g AS g, o.v + i.v AS v FROM"
                   f" (WITH {nm} AS (SELECT g, coalesce(v, 0) + 1"
                   f" AS v FROM {{s2}})"
                   f" SELECT g, max(v) AS v FROM {nm} GROUP BY g) i"
                   f" JOIN (SELECT g, max(v) AS v FROM {nm}"
                   f" GROUP BY g) o ON o.g = i.g)")
            return (tpl.format(s1=c1, s2=c2),
                    tpl.format(s1=d1, s2=d2))
        if kind == "asof_chain_setop":
            # chained ASOF composed with set operators / CTE heads
            # (r14, VERDICT r13 item 2) — the exact hazard zone of the
            # r13 ON-stop (set-op right after an ASOF ON condition)
            # and the alias-inliner set-op split.  Two sub-forms:
            # the chain as a DIRECT set-op branch (ON text followed
            # by INTERSECT/EXCEPT/UNION), and the chain's left side
            # as a statement-level CTE head (a def-bearing consumed
            # side — the InlineCTE probe's territory).  DuckDB parses
            # the same text left-associatively, natively.
            self.n_asof += 2
            c1, d1 = self.block(depth - 1)
            c2, d2 = self.block(0)
            c3, d3 = self.block(0)
            al, ar, ac = self.name("al"), self.name("ar"), self.name("ac")
            if self.rng.random() < 0.5:
                c4, d4 = self.block(0)
                setop = self.rng.choice(
                    ["UNION ALL", "INTERSECT", "EXCEPT"])
                ch_setop = (setop if setop == "UNION ALL"
                            else setop + " DISTINCT")
                tpl = (
                    f"(SELECT {al}.g AS g, {al}.v +"
                    f" coalesce({ar}.rv, 0) + coalesce({ac}.ix, 0)"
                    f" AS v FROM (SELECT g, coalesce(v, 0) AS v"
                    f" FROM {{s1}}) AS {al}"
                    f" ASOF LEFT JOIN (SELECT g, coalesce(v, 0) + 1"
                    f" AS rv FROM {{s2}}) AS {ar}"
                    f" ON {al}.g = {ar}.g AND {al}.v >= {ar}.rv"
                    f" ASOF LEFT JOIN (SELECT g, coalesce(v, 0) + 2"
                    f" AS ix FROM {{s3}}) AS {ac}"
                    f" ON {al}.g = {ac}.g AND {al}.v >= {ac}.ix"
                    f" {{setop}} SELECT g, coalesce(v, 0) AS v"
                    f" FROM {{s4}})")
                return (tpl.format(s1=c1, s2=c2, s3=c3, s4=c4,
                                   setop=ch_setop),
                        tpl.format(s1=d1, s2=d2, s3=d3, s4=d4,
                                   setop=setop))
            tpl = (
                f"(WITH {al} AS (SELECT g, coalesce(v, 0) AS v"
                f" FROM {{s1}})"
                f" SELECT {al}.g AS g, {al}.v +"
                f" coalesce({ar}.rv, 0) + coalesce({ac}.ix, 0) AS v"
                f" FROM {al}"
                f" ASOF LEFT JOIN (SELECT g, coalesce(v, 0) + 1"
                f" AS rv FROM {{s2}}) AS {ar}"
                f" ON {al}.g = {ar}.g AND {al}.v >= {ar}.rv"
                f" ASOF LEFT JOIN (SELECT g, coalesce(v, 0) + 2"
                f" AS ix FROM {{s3}}) AS {ac}"
                f" ON {al}.g = {ac}.g AND {al}.v >= {ac}.ix)")
            return (tpl.format(s1=c1, s2=c2, s3=c3),
                    tpl.format(s1=d1, s2=d2, s3=d3))
        if kind == "ties_setop":
            # LIMIT/FETCH … WITH TIES inside parenthesized set-op
            # branches (r14, VERDICT r13 item 2): exercises the
            # per-SELECT-block WITH TIES bridge (r13: any depth) at
            # the set-op boundary where _select_top/_inline_block had
            # their r13 bugs.  DuckDB mirror: rank() equivalence per
            # branch (WITH TIES ≡ rank over the same order ≤ n).
            c1, d1 = self.block(depth - 1)
            c2, d2 = self.block(0)
            n1 = self.rng.randint(1, 4)
            n2 = self.rng.randint(1, 3)
            setop = self.rng.choice(["UNION ALL", "INTERSECT", "EXCEPT"])
            ch_setop = (setop if setop == "UNION ALL"
                        else setop + " DISTINCT")
            spell1 = self.rng.choice(
                [f"FETCH FIRST {n1} ROWS WITH TIES",
                 f"LIMIT {n1} WITH TIES"])
            return (
                f"((SELECT g, v FROM {c1} ORDER BY g, v {spell1})"
                f" {ch_setop} (SELECT g, v FROM {c2}"
                f" ORDER BY g, v LIMIT {n2} WITH TIES))",
                f"((SELECT g, v FROM {d1} QUALIFY rank()"
                f" OVER (ORDER BY g, v) <= {n1})"
                f" {setop} (SELECT g, v FROM {d2} QUALIFY rank()"
                f" OVER (ORDER BY g, v) <= {n2}))")
        if kind == "quant_qualify":
            # correlated quantified comparison INSIDE QUALIFY (r14,
            # VERDICT r13 item 2): the quantifier splice runs in the
            # QUALIFY rewrite's scope.  Ordering ops only (the r13
            # hardening's filter-position rule); outer source through
            # corr_outer_source (leaf on a PPTU-buggy build); the
            # correlated sub is a leaf.  DuckDB mirror: window in a
            # subquery + WHERE (its QUALIFY disallows correlated
            # subqueries in some versions — the rewrite is the
            # documented equivalence).
            c1, d1 = self.corr_outer_source(depth)
            c2, d2, _ = self.leaf()
            op = self.rng.choice([">", ">=", "<", "<="])
            q = self.rng.choice(["ANY", "ALL"])
            t, u = self.name("t"), self.name("u")
            ch = (f"(SELECT {t}.g AS g, {t}.v AS v FROM {c1} AS {t}"
                  f" QUALIFY {t}.v = max({t}.v) OVER (PARTITION BY"
                  f" {t}.g) AND {t}.v {op} {q} (SELECT {u}.v + 1"
                  f" FROM {c2} AS {u} WHERE {u}.g = {t}.g))")
            duck = (f"(SELECT g, v FROM (SELECT g, v, max(v) OVER"
                    f" (PARTITION BY g) AS __mx FROM {d1}) {t}"
                    f" WHERE v = __mx AND v {op} {q} (SELECT {u}.v + 1"
                    f" FROM {d2} AS {u} WHERE {u}.g = {t}.g))")
            return ch, duck
        if kind == "array_join_asof":
            # ARRAY JOIN × ASOF in ONE statement (r14, VERDICT r13
            # item 2): the ASOF bridge's left side is itself an ARRAY
            # JOIN subquery — the bridge must rewrite the FROM clause
            # around the LATERAL VIEW expansion.  Left values are
            # NULL-free by construction (CH disallows Nullable ASOF
            # columns).  DuckDB: UNNEST mirror + native ASOF.
            self.n_asof += 1
            c1, d1 = self.block(depth - 1)
            c2, d2 = self.block(0)
            al, ar = self.name("al"), self.name("ar")
            ch = (f"(SELECT {al}.g AS g, {al}.v +"
                  f" coalesce({ar}.rv, 0) AS v"
                  f" FROM (SELECT g, u AS v FROM (SELECT g,"
                  f" [coalesce(v, 0), coalesce(v, 0) + 1] AS a"
                  f" FROM {c1}) ARRAY JOIN a AS u) AS {al}"
                  f" ASOF LEFT JOIN (SELECT g, coalesce(v, 0) + 1"
                  f" AS rv FROM {c2}) AS {ar}"
                  f" ON {al}.g = {ar}.g AND {al}.v >= {ar}.rv)")
            duck = (f"(SELECT {al}.g AS g, {al}.v +"
                    f" coalesce({ar}.rv, 0) AS v"
                    f" FROM (SELECT g, u AS v FROM (SELECT g,"
                    f" [coalesce(v, 0), coalesce(v, 0) + 1] AS a"
                    f" FROM {d1}) AS __ajs CROSS JOIN UNNEST(a)"
                    f" AS __un(u)) AS {al}"
                    f" ASOF LEFT JOIN (SELECT g, coalesce(v, 0) + 1"
                    f" AS rv FROM {d2}) AS {ar}"
                    f" ON {al}.g = {ar}.g AND {al}.v >= {ar}.rv)")
            return ch, duck
        if kind == "quantified_case":
            # quantified comparison inside a CASE arm (r13, VERDICT
            # r12 item 2): PROJECTION context, so every operator is
            # safe — the NULL-exact CASE rewrite matches DuckDB's
            # projected quantifier answer including the `= ANY` NULL
            # left operand (tests/test_r13_quantified_hardening pins
            # DuckDB's own FILTER-position inconsistency there, which
            # is why filter-context fuzz sticks to ordering ops).
            # CASE WHEN NULL falls to ELSE on both engines.
            c1, d1 = self.block(depth - 1)
            c2, d2 = self.block(0)
            op = self.rng.choice([">", ">=", "<", "<=", "=", "!="])
            q = self.rng.choice(["ANY", "ALL"])
            if self.rng.random() < 0.35:
                # correlated variant: projection context is safe for
                # = / != too (DuckDB's projected correlated
                # quantifiers are ANSI-consistent; only its FILTER
                # position diverges — pinned in the r13 hardening
                # suite).  The outer source must be a LEAF: Spark
                # 4.1.2's PushProjectionThroughUnion crashes on a
                # correlated subquery projected over a UNION child
                # (key not found: <inner attr> — pinned in
                # test_r13_fuzz_finds as a documented Spark
                # limitation), so union-bearing sources stay out of
                # the generated envelope — unless the session probe
                # (spark_pptu_bug) reports a fixed build (r14).
                c1, d1 = self.corr_outer_source(depth)
                t, u = self.name("t"), self.name("u")
                tpl = (f"(SELECT CASE WHEN {t}.v {op} {q}"
                       f" (SELECT {u}.v + 2 FROM {{s2}} AS {u}"
                       f" WHERE {u}.g = {t}.g) THEN {t}.v + 10"
                       f" ELSE coalesce({t}.v, -1) END AS v,"
                       f" g FROM {{s1}} AS {t})")
                # re-wrap to the (g, v) column order every block emits
                return (f"(SELECT g, v FROM {tpl.format(s1=c1, s2=c2)}"
                        f" AS w)",
                        f"(SELECT g, v FROM {tpl.format(s1=d1, s2=d2)}"
                        f" AS w)")
            tpl = (f"(SELECT g, CASE WHEN v {op} {q} (SELECT v + 2"
                   f" FROM {{s2}}) THEN v + 10"
                   f" ELSE coalesce(v, -1) END AS v FROM {{s1}})")
            return (tpl.format(s1=c1, s2=c2),
                    tpl.format(s1=d1, s2=d2))
        if kind == "quantified_setop":
            # quantified comparisons in BOTH branches of a set
            # operator (r13): ordering quantifiers only in filter
            # position (see quantified_case note).  INTERSECT/EXCEPT
            # spell DISTINCT on the CH side (the only value-equal
            # pass-through), bare on DuckDB.
            c1, d1 = self.block(depth - 1)
            c2, d2 = self.block(0)
            c3, d3 = self.block(depth - 1)
            c4, d4 = self.block(0)
            op1 = self.rng.choice([">", ">=", "<", "<="])
            op2 = self.rng.choice([">", ">=", "<", "<="])
            q1 = self.rng.choice(["ANY", "ALL"])
            q2 = self.rng.choice(["ANY", "ALL"])
            setop = self.rng.choice(
                ["UNION ALL", "INTERSECT", "EXCEPT"])
            ch_setop = (setop if setop == "UNION ALL"
                        else setop + " DISTINCT")
            tpl = (f"(SELECT g, v FROM {{s1}} WHERE v {op1} {q1}"
                   f" (SELECT v + 1 FROM {{s2}})"
                   f" {{setop}} SELECT g, v FROM {{s3}} WHERE v"
                   f" {op2} {q2} (SELECT v + 3 FROM {{s4}}))")
            return (tpl.format(s1=c1, s2=c2, s3=c3, s4=c4,
                               setop=ch_setop),
                    tpl.format(s1=d1, s2=d2, s3=d3, s4=d4,
                               setop=setop))
        if kind == "correlated_quant":
            # CORRELATED quantified comparison (r13, VERDICT r12
            # item 6): the sub references the outer row's g through
            # an equality predicate — the rewrite splices it into up
            # to three correlated scalar subqueries, decorrelated by
            # Spark.  Ordering ops only (filter position); the sub is
            # a LEAF so the correlation depth stays in Spark's
            # supported envelope (matching the bridged subset); the
            # outer source is a leaf too (PushProjectionThroughUnion
            # limitation — see quantified_case) until the session
            # probe (spark_pptu_bug) reports a fixed build (r14).
            c1, d1 = self.corr_outer_source(depth)
            c2, d2, _ = self.leaf()
            op = self.rng.choice([">", ">=", "<", "<="])
            q = self.rng.choice(["ANY", "ALL"])
            t, u = self.name("t"), self.name("u")
            tpl = (f"(SELECT {t}.g AS g, {t}.v AS v FROM {{s1}}"
                   f" AS {t} WHERE {t}.v {op} {q} (SELECT {u}.v + 1"
                   f" FROM {{s2}} AS {u} WHERE {u}.g = {t}.g))")
            return (tpl.format(s1=c1, s2=c2),
                    tpl.format(s1=d1, s2=d2))
        if kind == "asof_shared_cte":
            # TWO parallel ASOF legs consuming the SAME statement-
            # level CTE side (r13, VERDICT r12 item 2): pass 1 of the
            # bridge resolves the shared def for leg 1 and must KEEP
            # the def (still referenced by leg 2); pass 2 consumes it
            # and the excision then drops it — the exact hazard zone
            # of the r12j consumed-entry logic.  DuckDB native ASOF
            # is the mirror verbatim.
            self.n_asof += 2
            c1, d1 = self.block(depth - 1)
            c2, d2 = self.block(depth - 1)
            c3, d3 = self.block(0)
            sh_nm = self.name("sh")
            l1, l2 = self.name("l"), self.name("l")
            tpl = (
                f"(WITH {sh_nm} AS (SELECT g, coalesce(v, 0) + 1 AS"
                f" rv FROM {{s3}})"
                f" SELECT g, v FROM (SELECT {l1}.g AS g, {l1}.v +"
                f" coalesce({sh_nm}.rv, 0) AS v FROM (SELECT g,"
                f" coalesce(v, 0) AS v FROM {{s1}}) AS {l1}"
                f" ASOF LEFT JOIN {sh_nm} ON {l1}.g = {sh_nm}.g"
                f" AND {l1}.v >= {sh_nm}.rv)"
                f" UNION ALL"
                f" SELECT g, v FROM (SELECT {l2}.g AS g, {l2}.v +"
                f" coalesce({sh_nm}.rv, 0) AS v FROM (SELECT g,"
                f" coalesce(v, 0) AS v FROM {{s2}}) AS {l2}"
                f" ASOF LEFT JOIN {sh_nm} ON {l2}.g = {sh_nm}.g"
                f" AND {l2}.v >= {sh_nm}.rv))")
            return (tpl.format(s1=c1, s2=c2, s3=c3),
                    tpl.format(s1=d1, s2=d2, s3=d3))
        if kind == "qualify":
            # post-window filter (r12l): keep each group's max-v row.
            # DuckDB's native QUALIFY is the mirror verbatim; ties on
            # (g, v) are identical rows, so rank-free equality filters
            # stay multiset-deterministic.  The ternary variant (r13
            # advice: QUALIFY joined the ternary boundary keyword
            # lists) spells the same predicate `cond ? a : b`.
            c1, d1 = self.block(depth - 1)
            duck = (f"(SELECT g, v FROM {d1} QUALIFY"
                    f" v = max(v) OVER (PARTITION BY g))")
            if self.rng.random() < 0.3:
                return (f"(SELECT g, v FROM {c1} QUALIFY"
                        f" v = max(v) OVER (PARTITION BY g)"
                        f" ? true : false)", duck)
            return (f"(SELECT g, v FROM {c1} QUALIFY"
                    f" v = max(v) OVER (PARTITION BY g))", duck)
        if kind == "paginate":
            # CH LIMIT offset, n / ANSI OFFSET-FETCH → LIMIT-OFFSET
            # mirror.  Total order (g, v) makes the page a multiset
            # invariant (equal sort keys here are identical rows).
            c1, d1 = self.block(depth - 1)
            off = self.rng.randint(0, 3)
            n = self.rng.randint(1, 4)
            form = self.rng.choice(["comma", "fetch", "ties"])
            duck = (f"(SELECT g, v FROM {d1} ORDER BY g, v"
                    f" LIMIT {n} OFFSET {off})")
            if form == "comma":
                return (f"(SELECT g, v FROM {c1} ORDER BY g, v"
                        f" LIMIT {off}, {n})", duck)
            if form == "ties":
                # WITH TIES over the total order (g, v): tied rows are
                # IDENTICAL rows, so the extended page is a multiset
                # invariant.  DuckDB 1.0.0 has no WITH TIES spelling —
                # the mirror is the standard rank() equivalence
                # (WITH TIES ≡ rank over the same order ≤ n).
                return (f"(SELECT g, v FROM {c1} ORDER BY g, v"
                        f" FETCH FIRST {n} ROWS WITH TIES)",
                        f"(SELECT g, v FROM {d1} QUALIFY rank()"
                        f" OVER (ORDER BY g, v) <= {n})")
            return (f"(SELECT g, v FROM {c1} ORDER BY g, v OFFSET"
                    f" {off} ROWS FETCH NEXT {n} ROWS ONLY)", duck)
        if kind == "ternary_cast":
            # C-style ternary + :: cast (r12m): CH's `cond ? a : b`
            # mirrors to CASE WHEN; `::Int64`/`::String` round-trip
            # keeps values integral.  NULL cond (v NULL) -> NULL on
            # both engines (CASE WHEN NULL and if(NULL,..) both take
            # the else branch... CH's if() treats NULL cond as false,
            # CASE WHEN NULL falls to ELSE — same branch).
            c1, d1 = self.block(depth - 1)
            t = self.rng.randint(2, 5)
            return (f"(SELECT g, v > {t} ? v + g : v - g AS v"
                    f" FROM (SELECT g, v::Nullable(Int64)::Int64 AS v"
                    f" FROM {c1}))",
                    f"(SELECT g, CASE WHEN v > {t} THEN v + g"
                    f" ELSE v - g END AS v FROM (SELECT g,"
                    f" CAST(v AS BIGINT) AS v FROM {d1}))")
        # prewhere_settings
        c1, d1 = self.block(depth - 1)
        thr = self.rng.randint(0, 6)
        settings = (" SETTINGS max_threads = 1"
                    if self.rng.random() < 0.5 else "")
        return (f"(SELECT g, v FROM {c1} PREWHERE v > {thr}{settings})",
                f"(SELECT g, v FROM {d1} WHERE v > {thr})")

    def _mi_ch(self, src: str) -> str:
        """CH maxIntersections block over intervals (coalesce(v,0),
        coalesce(v,0)+g+2) — forward, NULL-free, sweep-eligible (the
        bare call IS the select item, so the window rewrite applies)."""
        a = self.name("mi")
        # source v renamed vv so the call's AS v alias cannot shadow
        # it (CH alias-visibility would inline an aggregate into any
        # later reference — see the maxint_having kind note)
        return (f"(SELECT g, maxIntersections(vv, vv + g + 2) AS v"
                f" FROM (SELECT g, coalesce(v, 0) AS vv"
                f" FROM {src} __i{a}) {a} GROUP BY g)")

    def _mi_duck(self, src: str) -> str:
        """DuckDB mirror of :meth:`_mi_ch`: the (position, ±1) event
        sweep with ends-before-starts tie order (the r14 test's
        pinned spelling), max running count per group."""
        b, pt, rn = self.name("mb"), self.name("mp"), self.name("mr")
        return (
            f"(WITH {b} AS (SELECT g, coalesce(v, 0) AS s,"
            f" coalesce(v, 0) + g + 2 AS e FROM {src}),"
            f" {pt} AS (SELECT g, u.p AS p, u.w AS w FROM {b},"
            f" UNNEST([struct_pack(p := s::DOUBLE, w := 1),"
            f" struct_pack(p := e::DOUBLE, w := -1)]) AS __t(u)),"
            f" {rn} AS (SELECT g, sum(w) OVER (PARTITION BY g"
            f" ORDER BY p, w ROWS UNBOUNDED PRECEDING) AS c FROM {pt})"
            f" SELECT g, CAST(max(c) AS BIGINT) AS v"
            f" FROM {rn} GROUP BY g)")

    def _seq_time_over(self, c1: str, d1: str,
                       match_only: bool) -> tuple[str, str]:
        """Time-guarded sequenceMatch/sequenceCount block over an
        arbitrary (g, v) source pair — ts := v over a DISTINCT
        NULL-free source (unique ts per group pins the token order on
        both engines).  Mirrors are INDEPENDENT derivations: existence
        via a 2-way self-join EXISTS, count via a recursive-CTE greedy
        scan (min end index with start >= scan_from, resume after it —
        the ev33 oracle technique).  Contract documented at the
        seq_time kind."""
        pool = ["{x} % 2 = 0", "{x} % 3 = 1", "{x} % 3 < 2",
                "{x} % 5 != 0", "{x} % 4 >= 1"]
        cnd = [self.rng.choice(pool), self.rng.choice(pool)]
        sep = self.rng.choice(["", ".*", ".+"])
        ops = ["<", ">", "<=", ">=", "==", "!="]
        guards = [(self.rng.choice(ops), self.rng.randint(1, 6))
                  for _ in range(self.rng.randint(1, 2))]
        pat = ("(?1)" + "".join(f"(?t{op}{n})" for op, n in guards)
               + sep + "(?2)")
        fn = "sequenceMatch" if match_only else "sequenceCount"
        src, tk, rc, g2 = (self.name("sq"), self.name("sqt"),
                          self.name("sqr"), self.name("sqg"))
        ch_conds = ", ".join(c.format(x="v") for c in cnd)
        ch = (f"(SELECT g, CAST({fn}('{pat}')(v, {ch_conds})"
              f" AS Int64) AS v FROM (SELECT DISTINCT g, v FROM {c1}"
              f" WHERE v IS NOT NULL) AS {src} GROUP BY g)")
        pos = {"": "t2.i = t1.i + 1", ".*": "t2.i > t1.i",
               ".+": "t2.i > t1.i + 1"}[sep]
        dop = {"==": "=", "!=": "<>"}
        tg = " AND ".join(
            f"(t2.ts - t1.ts) {dop.get(op, op)} {n}" for op, n in guards)
        toks = (
            f"{src} AS (SELECT DISTINCT g, v FROM {d1}"
            f" WHERE v IS NOT NULL),"
            f" {tk} AS (SELECT g, v AS ts, tok, row_number() OVER"
            f" (PARTITION BY g ORDER BY v) - 1 AS i FROM"
            f" (SELECT g, v, CASE WHEN ({cnd[0].format(x='v')})"
            f" THEN 1 WHEN ({cnd[1].format(x='v')}) THEN 2 END AS tok"
            f" FROM {src}) z WHERE tok IS NOT NULL)")
        if match_only:
            duck = (
                f"(WITH {toks}"
                f" SELECT {g2}.g AS g, CAST(CASE WHEN EXISTS("
                f"SELECT 1 FROM {tk} t1, {tk} t2"
                f" WHERE t1.g = {g2}.g AND t2.g = {g2}.g"
                f" AND t1.tok = 1 AND t2.tok = 2 AND {pos} AND {tg})"
                f" THEN 1 ELSE 0 END AS BIGINT) AS v"
                f" FROM (SELECT DISTINCT g FROM {src}) {g2})")
            return ch, duck
        duck = (
            f"(WITH {toks},"
            f" {rc} AS ("
            f" WITH RECURSIVE r(g, sf, cnt) AS ("
            f" SELECT g, 0, 0 FROM (SELECT DISTINCT g FROM {tk}) u"
            f" UNION ALL"
            f" SELECT g, e + 1, cnt + 1 FROM ("
            f" SELECT r2.g, (SELECT min(t2.i) FROM {tk} t1, {tk} t2"
            f" WHERE t1.g = r2.g AND t2.g = r2.g AND t1.tok = 1"
            f" AND t2.tok = 2 AND t1.i >= r2.sf AND {pos} AND {tg}"
            f" ) AS e, r2.cnt FROM r r2) x WHERE e IS NOT NULL)"
            f" SELECT g, max(cnt) AS cnt FROM r GROUP BY g)"
            f" SELECT {g2}.g AS g, CAST(coalesce({rc}.cnt, 0)"
            f" AS BIGINT) AS v"
            f" FROM (SELECT DISTINCT g FROM {src}) {g2}"
            f" LEFT JOIN {rc} ON {rc}.g = {g2}.g)")
        return ch, duck

    def _snn_over(self, c1: str, d1: str) -> tuple[str, str]:
        """sequenceNextNode block over an arbitrary (g, v) source
        relation pair — factored out so composition kinds
        (snn_over_asof, snn_shared_cte) can feed it bridged or
        CTE-named sources.  Contract and mirror documented at the
        seq_next_node kind."""
        direction, base = self.rng.choice([
            ("forward", "head"), ("forward", "first_match"),
            ("forward", "last_match"), ("backward", "tail"),
            ("backward", "first_match"), ("backward", "last_match"),
        ])  # the six CH-valid pairs (r14 second phase)
        d = 1 if direction == "forward" else -1
        n_ev = self.rng.randint(1, 2)
        pool = ["{x} % 2 = 0", "{x} % 3 = 1", "{x} % 3 < 2",
                "{x} % 5 != 0", "{x} % 4 >= 1"]
        cnd = [self.rng.choice(pool) for _ in range(1 + n_ev)]
        src, o, b, og = (self.name("sn"), self.name("sno"),
                         self.name("snb"), self.name("sng"))
        ch_conds = ", ".join(c.format(x="v") for c in cnd)
        ch = (f"(SELECT g, CAST(sequenceNextNode('{direction}',"
              f" '{base}')(v, CAST(v AS String), {ch_conds})"
              f" AS Int64) AS v FROM (SELECT DISTINCT g, v"
              f" FROM {c1}) AS {src} GROUP BY g)")
        if base == "head":
            b_sql = (f"SELECT g, 1 AS brn FROM {o} WHERE rn = 1"
                     f" AND ({cnd[0].format(x='v')})")
        elif base == "tail":
            b_sql = (f"SELECT g, rn AS brn FROM {o} WHERE rn = m"
                     f" AND ({cnd[0].format(x='v')})")
        else:
            agg = "min" if base == "first_match" else "max"
            b_sql = (f"SELECT g, {agg}(rn) AS brn FROM {o}"
                     f" WHERE ({cnd[1].format(x='v')}) AND"
                     f" ({cnd[0].format(x='v')}) GROUP BY g")
        chain = " AND ".join(
            f"({cnd[j + 1].format(x=f'e{j + 1}.v')})"
            for j in range(n_ev))
        ejoins = " ".join(
            f"LEFT JOIN {o} e{j + 1} ON e{j + 1}.g = {og}.g"
            f" AND e{j + 1}.rn = {b}.brn + {d * j}"
            for j in range(n_ev))
        duck = (f"(WITH {src} AS (SELECT DISTINCT g, v FROM {d1}),"
                f" {o} AS (SELECT g, v, row_number() OVER ("
                f"PARTITION BY g ORDER BY v) AS rn,"
                f" count(*) OVER (PARTITION BY g) AS m FROM {src}"
                f" WHERE v IS NOT NULL),"
                f" {b} AS ({b_sql})"
                f" SELECT {og}.g AS g, CAST(CASE WHEN {chain}"
                f" THEN nx.v END AS BIGINT) AS v"
                f" FROM (SELECT DISTINCT g FROM {src}) {og}"
                f" LEFT JOIN {b} ON {b}.g = {og}.g {ejoins}"
                f" LEFT JOIN {o} nx ON nx.g = {og}.g"
                f" AND nx.rn = {b}.brn + {d * n_ev})")
        return ch, duck

    def query(self) -> tuple[str, str]:
        # mostly depth 1-3; an occasional 4 for deeper nesting strata
        depth = self.rng.choice([1, 2, 2, 3, 3, 4])
        if self.rng.random() < 0.12:
            # WITH FILL over a UNION body (r13, VERDICT r12 item 2):
            # the fill spec applies to the whole union result; filled
            # rows carry the column-type DEFAULT (g -> 0) per CH, the
            # grid is FROM..TO-exclusive minus the observed DISTINCT
            # sort values, originals are all kept.  v is coalesced
            # NULL-free so the grid subtraction is well-defined.
            c1, d1 = self.block(depth - 1)
            c2, d2 = self.block(depth - 1)
            hi = self.rng.randint(4, 9)
            ch = (f"SELECT g, coalesce(v, 0) AS v FROM {c1}"
                  f" UNION ALL SELECT g, coalesce(v, 0) AS v FROM {c2}"
                  f" ORDER BY v WITH FILL FROM 0 TO {hi}")
            duck = (
                f"WITH __b AS (SELECT g, coalesce(v, 0) AS v FROM {d1}"
                f" UNION ALL SELECT g, coalesce(v, 0) AS v FROM {d2})"
                f" SELECT g, v FROM __b UNION ALL"
                f" SELECT 0 AS g, x AS v FROM range(0, {hi}) AS __r(x)"
                f" WHERE x NOT IN (SELECT v FROM __b)")
            return ch, duck
        if self.rng.random() < 0.08:
            # WITH FILL … INTERPOLATE (LOCF) over the observed
            # min..max grid (r13): base aggregated to ONE row per v so
            # the carry is deterministic; first grid row is always
            # observed (grid starts at min(v)).  Mirror follows the
            # ev25 oracle shape: spine LEFT JOIN base + last_value
            # IGNORE NULLS.  Distinct alias gg avoids shadowing the
            # source column inside the aggregate.
            c1, d1 = self.block(depth - 1)
            ch = (f"SELECT gg, v FROM (SELECT max(g) AS gg,"
                  f" coalesce(v, 0) AS v FROM {c1} GROUP BY"
                  f" coalesce(v, 0)) ORDER BY v WITH FILL"
                  f" INTERPOLATE (gg AS gg)")
            duck = (
                f"WITH __b AS (SELECT max(g) AS gg, coalesce(v, 0)"
                f" AS v FROM {d1} GROUP BY coalesce(v, 0)),"
                f" __s AS (SELECT CAST(unnest(generate_series("
                f" CAST((SELECT min(v) FROM __b) AS BIGINT),"
                f" CAST((SELECT max(v) FROM __b) AS BIGINT),"
                f" 1)) AS BIGINT) AS v)"
                f" SELECT coalesce(b.gg, last_value(b.gg IGNORE NULLS)"
                f" OVER (ORDER BY s.v ROWS BETWEEN UNBOUNDED PRECEDING"
                f" AND CURRENT ROW)) AS gg, s.v AS v"
                f" FROM __s s LEFT JOIN __b b USING (v)")
            return ch, duck
        if self.rng.random() < (0.3 if "fill_qualify" in self.focus
                                else 0.07):
            self.kind_tally["fill_qualify"] = (
                self.kind_tally.get("fill_qualify", 0) + 1)
            # WITH FILL × QUALIFY in one statement (r15, VERDICT r14
            # item 5): the fill spec is EXTRACTED before translate and
            # QUALIFY is RELOCATED during it — this pins their
            # ordering.  One row per g survives QUALIFY; filled rows
            # carry the column-type default g=0; grid is FROM..TO-
            # exclusive minus observed DISTINCT v (the r13 fill-kind
            # contract).  DuckDB runs QUALIFY natively.
            c1, d1 = self.block(depth - 1)
            hi = self.rng.randint(4, 9)
            qual = ("row_number() OVER (PARTITION BY g"
                    " ORDER BY coalesce(v, 0)) = 1")
            ch = (f"SELECT g, v FROM (SELECT g, coalesce(v, 0) AS v"
                  f" FROM {c1} __fq QUALIFY {qual}) __fo"
                  f" ORDER BY v WITH FILL FROM 0 TO {hi}")
            duck = (
                f"WITH __b AS (SELECT g, coalesce(v, 0) AS v"
                f" FROM {d1} __fq QUALIFY {qual})"
                f" SELECT g, v FROM __b UNION ALL"
                f" SELECT 0 AS g, x AS v FROM range(0, {hi}) AS __r(x)"
                f" WHERE x NOT IN (SELECT v FROM __b)")
            return ch, duck
        if self.rng.random() < (0.35 if "anyjoin_defer" in self.focus
                                else 0.06):
            # ANY LEFT JOIN of a literal dim onto the shared fz_dup
            # fact (r17, VERDICT r16 item 7): accept variants take the
            # r16 `_defer_any_left_join` eager-aggregation rewrite
            # (depth-0 statement, bare fact, FROM-less literal right,
            # any(b.col) items); decline variants (HAVING, aliased
            # fact) keep the original shape.  The dim's USING keys are
            # UNIQUE, so CH's any(b.kv) is the single attached value
            # and a plain LEFT JOIN + min(kv) is an exact DuckDB
            # mirror (all-NULL groups min to NULL exactly like any).
            self.kind_tally["anyjoin_defer"] = (
                self.kind_tally.get("anyjoin_defer", 0) + 1)
            keys = self.rng.sample([0, 1, 2, 3], self.rng.randint(1, 3))
            dim_rows = [(k, self.rng.randint(5, 99)) for k in keys]
            first = dim_rows[0]
            dim = f"SELECT {first[0]} AS g, {first[1]} AS kv"
            for k, kv in dim_rows[1:]:
                dim += f" UNION ALL SELECT {k}, {kv}"
            j = self.rng.randint(0, 2)
            where = (f" WHERE rv % 3 <> {j}"
                     if self.rng.random() < 0.5 else "")
            variant = self.rng.choice(
                ["accept", "accept_order", "decl_having", "decl_alias"])
            fact_ch = fact_duck = "fz_dup"
            tail_ch = tail_duck = ""
            if variant == "accept_order":
                tail_ch = tail_duck = " ORDER BY g"
            elif variant == "decl_having":
                tail_ch = " HAVING count() >= 1"
                tail_duck = " HAVING count(*) >= 1"
            elif variant == "decl_alias":
                fact_ch = fact_duck = "fz_dup AS f"
            ch = (f"SELECT g, CAST(sum(rv) AS BIGINT) AS s,"
                  f" any(b.kv) AS k"
                  f" FROM {fact_ch} ANY LEFT JOIN ({dim}) AS b"
                  f" USING (g){where} GROUP BY g{tail_ch}")
            duck = (f"SELECT g, CAST(sum(rv) AS BIGINT) AS s,"
                    f" min(b.kv) AS k"
                    f" FROM {fact_duck} LEFT JOIN ({dim}) AS b"
                    f" USING (g){where} GROUP BY g{tail_duck}")
            return ch, duck
        if self.rng.random() < 0.15:
            # grouped final: per-key aggregates over the composition
            # (the global finals below never exercise group-level
            # NULL-key handling)
            c, d = self.block(depth)
            return (f"SELECT g, CAST(sum(v) AS BIGINT) AS s,"
                    f" count() AS c FROM {c} GROUP BY g",
                    f"SELECT g, CAST(sum(v) AS BIGINT) AS s,"
                    f" count(*) AS c FROM {d} GROUP BY g")
        c, d = self.block(depth)
        if self.rng.random() < 0.2:
            # intervalLengthSum over (v, v + g + 2): the r12 stateless
            # window plan vs DuckDB's running-max cover spelling (the
            # ev26 oracle form); intervals here are always forward so
            # the fold's negative-length branch is irrelevant.  CH
            # SKIPS NULL-argument rows (seed 990001/130: a lone NULL
            # row answers 0, not NULL), so the mirror filters them
            # from the cover window but counts them, and preserves
            # the engine's documented ANSI NULL on a truly EMPTY set.
            return (
                f"SELECT CAST(intervalLengthSum(v, v + g + 2)"
                f" AS BIGINT) AS s, count() AS c FROM {c}",
                f"SELECT CAST(CASE WHEN (SELECT count(*) FROM {d}) = 0"
                f" THEN NULL ELSE coalesce(sum(CASE WHEN cover IS NULL"
                f" OR s0 >= cover THEN e0 - s0 WHEN e0 > cover"
                f" THEN e0 - cover ELSE 0 END), 0) END AS BIGINT) AS s,"
                f" (SELECT CAST(count(*) AS BIGINT) FROM {d}) AS c"
                f" FROM (SELECT v AS s0,"
                f" v + g + 2 AS e0, max(v + g + 2) OVER (ORDER BY v,"
                f" v + g + 2 ROWS BETWEEN UNBOUNDED PRECEDING AND"
                f" 1 PRECEDING) AS cover"
                f" FROM {d} WHERE v IS NOT NULL)")
        agg = self.rng.choice([
            ("CAST(sum(v) AS BIGINT) AS s, count() AS c",
             "CAST(sum(v) AS BIGINT) AS s, count(*) AS c"),
            ("CAST(sum(v * g) AS BIGINT) AS s, count() AS c",
             "CAST(sum(v * g) AS BIGINT) AS s, count(*) AS c"),
            ("CAST(max(v) AS BIGINT) AS s, CAST(min(v) AS BIGINT) AS c",
             "CAST(max(v) AS BIGINT) AS s, CAST(min(v) AS BIGINT) AS c"),
            # -If combinators -> FILTER / CASE mirrors.  CH's sumIf
            # answers 0 (not NULL) when no row matches — the bridge
            # coalesces (ch_compat sumIf handler), so the mirror must
            # too; first extended-vocabulary fuzz run caught the bare
            # FILTER spelling answering NULL over an empty match set.
            ("CAST(sumIf(v, g = 1) AS BIGINT) AS s,"
             " CAST(countIf(v > 3) AS BIGINT) AS c",
             "CAST(coalesce(sum(v) FILTER (WHERE g = 1), 0)"
             " AS BIGINT) AS s,"
             " CAST(count(*) FILTER (WHERE v > 3) AS BIGINT) AS c"),
            # uniqExact -> COUNT(DISTINCT): NULL excluded on both
            ("CAST(uniqExact(v) AS BIGINT) AS s, count() AS c",
             "CAST(count(DISTINCT v) AS BIGINT) AS s, count(*) AS c"),
        ])
        return (f"SELECT {agg[0]} FROM {c}",
                f"SELECT {agg[1]} FROM {d}")


def run_fuzz(n_queries: int, seed: int, spark=None,
             focus: list[str] | None = None,
             tally: dict[str, int] | None = None) -> list[str]:
    """Returns a list of failure descriptions (empty = all agree).
    ``focus`` biases half the block draws toward the named kinds;
    ``tally`` (if given) accumulates per-kind draw counts."""
    import warnings

    import duckdb

    from transaq_clickhouse_exporter_spark.queries.ch_compat import (
        run_ch_sql, spark_pptu_bug)
    if spark is None:
        from transaq_clickhouse_exporter_spark.session import get_spark
        spark = get_spark(app="tce-dialect-fuzz")
        spark.sparkContext.setLogLevel("ERROR")
    # envelope gate: on a PushProjectionThroughUnion-fixed build the
    # correlated kinds widen to union-bearing outer sources
    pptu_clean = not spark_pptu_bug(spark)
    con = duckdb.connect()
    # shared duplicate-bearing table for the r17 kinds (asof_right_dedup
    # needs a PLAIN table name for the `_asof_right_sans_distinct`
    # accept path; anyjoin_defer needs a bare unaliased fact): identical
    # deterministic rows on both engines, with exact-duplicate (g, rv)
    # pairs so a dropped-vs-kept dedup is value-visible when it matters
    spark.sql(
        "SELECT id % 4 AS g, (id * id) % 11 AS rv FROM range(24)"
        " UNION ALL"
        " SELECT id % 4 AS g, (id * id) % 11 AS rv FROM range(24)"
        " WHERE id % 2 = 0"
    ).createOrReplaceTempView("fz_dup")
    con.execute(
        "CREATE OR REPLACE TABLE fz_dup AS"
        " SELECT range % 4 AS g, (range * range) % 11 AS rv FROM range(24)"
        " UNION ALL"
        " SELECT range % 4 AS g, (range * range) % 11 AS rv FROM range(24)"
        " WHERE range % 2 = 0"
    )
    failures: list[str] = []
    for i in range(n_queries):
        rng = random.Random((seed << 20) | i)
        g = Gen(rng, pptu_clean=pptu_clean, focus=focus)
        ch, duck = g.query()
        if tally is not None:
            for k, c in g.kind_tally.items():
                tally[k] = tally.get(k, 0) + c
        try:
            want = con.execute(duck).fetchall()
        except Exception as e:  # mirror invalid on duck — generator bug
            failures.append(f"[{seed}/{i}] DUCK-ERR {duck} -> {e}")
            continue
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                got = [tuple(r) for r in run_ch_sql(spark, ch).collect()]
        except Exception as e:
            failures.append(
                f"[{seed}/{i}] CH-ERR {ch} -> "
                f"{str(e).splitlines()[0][:120]}")
            continue
        if sorted(got, key=repr) != sorted(
                [tuple(r) for r in want], key=repr):
            failures.append(
                f"[{seed}/{i}] DIFF got={got} want={want}\n  ch: {ch}")
    return failures


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--focus")]
    focus = None
    for a in sys.argv[1:]:
        if a.startswith("--focus="):
            focus = a.split("=", 1)[1].split(",")
    n = int(argv[0]) if len(argv) > 0 else 120
    seed = int(argv[1]) if len(argv) > 1 else 12
    tally: dict[str, int] = {}
    fails = run_fuzz(n, seed, focus=focus, tally=tally)
    for f in fails:
        print(f)
    if focus:
        print("focus tally:", {k: tally.get(k, 0) for k in focus})
    print(f"fuzz: {n} queries, seed {seed}, failures {len(fails)}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
