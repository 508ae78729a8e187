"""ANSI/INT-overflow audit over the whole catalog (VERDICT r12 task 1).

The crash class: Spark's F.size/F.length/dayofweek/etc. return 32-bit
INT, and under ANSI mode (the Spark 4 default for plain sessions)
``int OP int`` stays INT and RAISES on overflow at runtime — the Flesch
``84600 * sy`` crash (r12), the minhash shifts (r2), the Gini bound.
Greps find *call sites*; what actually overflows is the *typed
arithmetic node*, so this script walks every catalog entry's ANALYZED
plan via py4j and flags each Multiply/Add/Subtract/UnaryMinus/Pmod/
Remainder/Divide(integral) whose dataType is IntegerType (or narrower).

Usage::

    python scripts/audit_int_arith.py [sf_dir]   # default sf0.001

Output: one line per (entry, expression) flag, then a summary. Flags are
*candidates* — many are provably bounded (year/month arithmetic, ntile
buckets); the point is that the triage list is complete and each site
gets an explicit verdict, recorded in tests/test_properties.py's audit
table rather than re-derived by eye each round.
"""

from __future__ import annotations

import sys

INT_ARITH = {
    "Multiply",
    "Add",
    "Subtract",
    "UnaryMinus",
    "Pmod",
    "Remainder",
    "IntegralDivide",
}
NARROW = {"IntegerType", "ShortType", "ByteType"}


def _iter_seq(seq):
    for i in range(seq.size()):
        yield seq.apply(i)


def flag_expressions(plan) -> list[str]:
    """Walk a logical plan (py4j JavaObject) and return the flagged
    integer-arithmetic expression strings."""
    out = []
    seen = set()

    def walk_expr(e):
        eid = e.hashCode()
        name = e.getClass().getSimpleName()
        if name in INT_ARITH:
            try:
                dt = e.dataType().getClass().getSimpleName().replace("$", "")
            except Exception:  # noqa: BLE001 — some exprs are unresolved
                dt = "?"
            if dt in NARROW:
                key = (name, e.toString())
                if key not in seen:
                    seen.add(key)
                    out.append(f"{name}[{dt}] {e.toString()}")
        for c in _iter_seq(e.children()):
            walk_expr(c)

    def walk_plan(p):
        for e in _iter_seq(p.expressions()):
            walk_expr(e)
        for c in _iter_seq(p.children()):
            walk_plan(c)
        # subqueries live off the expression tree's plan links; the
        # top-level expressions() walk covers scalar subquery exprs'
        # children only if exposed — also walk innerChildren
        for c in _iter_seq(p.innerChildren()):
            walk_plan(c)

    walk_plan(plan)
    return out


def main() -> int:
    sys.path.insert(0, "/root/repo")
    from surge_spark.queries import all_queries
    from surge_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:] or None
    spark = get_spark("int-arith-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = only or sorted(queries)
    n_flagged = 0
    errs = []
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            plan = df._jdf.queryExecution().analyzed()
            flags = flag_expressions(plan)
        except Exception as e:  # noqa: BLE001
            errs.append((name, f"{type(e).__name__}: {e}"))
            continue
        for f in flags:
            print(f"FLAG {name}: {f}")
            n_flagged += 1
    for name, e in errs:
        print(f"ERROR {name}: {e[:200]}")
    print(f"\n{len(names)} entries scanned, {n_flagged} integer-arith flags, "
          f"{len(errs)} errors")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
