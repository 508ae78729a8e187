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

import re
import sys

# --- the pinned bounded-class allowlist (r14 VERDICT task 5) ---------------
# Every flag the walk raises must match one of these named classes, each
# bounded BY CONSTRUCTION (the r13 triage, now executable): a new entry
# whose integer arithmetic fits no class FAILS
# tests/test_properties.py::test_int_arith_flags_all_in_bounded_classes
# with the entry and expression named — the audit is a test, not a
# discipline. Patterns match Spark's analyzed-plan expression toString.
# Review-tightened (r14 pass 1): the first cut of these patterns was far
# looser than the classes they name — arbitrary col*col matched
# 'indicator-product', any expr CONTAINING size(/pos#/year( matched its
# class — so the allowlist test would have passed vacuously for exactly
# the unbounded channels it exists to catch. Every pattern below anchors
# the WHOLE flagged expression (or its leading operand) to the named
# shape; adversarial non-members are pinned as negative cases in
# tests/test_properties.py.
BOUNDED_CLASSES: list[tuple[str, "re.Pattern[str]"]] = [
    # quantile-bucket / prefix-shard boolean chains: the INNERMOST term
    # is (literal + cast((comparison) as int)) and every further term is
    # another 0/1 cast — chains are <= 64 terms
    # (rfm/pareto/gini/pack/percentile shards)
    (
        "bucket-boolean-chain",
        re.compile(
            r"^Add\[\w+\] \(+\d+ \+ cast\(\(.*[<>]=? .*\) as int\)\)"
            r"( \+ cast\(\(.*?\) as int\)\))*$",
            re.S,
        ),
    ),
    # 0/1 indicator products: both factors must LOOK like indicators
    # (_ha/_hb pair-presence bits, in_short/in_long window bits, is_*)
    (
        "indicator-product",
        re.compile(
            r"^Multiply\[\w+\] \((_h[ab]|in_[a-z_]+|is_[a-z_]+)#\d*"
            r" \* (_h[ab]|in_[a-z_]+|is_[a-z_]+)#\d*\)$"
        ),
    ),
    # token-position offsets: the LEADING operand must itself be a
    # token-position/count field (span bounds, pos, max(pos), lambda
    # slice index, size(...), token-count struct fields) and the rest of
    # the expression only combines those with literals — all bounded by
    # a document's token count
    (
        "token-offset",
        re.compile(
            r"^(Add|Subtract)\[\w+\] \(+"
            r"(span_end#\d*|span_start#\d*|pos#\d*|max\(pos#\d*\)"
            r"|lambda x_\d+#\d*|size\(|s#\d*\.n[td]"
            r"|CASE WHEN \(*s#\d*\.n[td])"
        ),
    ),
    # calendar arithmetic: the expression must be COMPOSED of
    # year()/month() extractions, literals, and +-*() only (checked
    # structurally in classify_flag, not by containment)
    ("year-month", None),  # handled by _is_year_month_composition
    # weighted indicator packs: literal-weighted CASE WHEN (cmp) THEN 1
    # ELSE 0 END terms combined with +-* — ordinal-pattern codes,
    # bit-packs (bounded by the sum of the literal weights); checked
    # structurally like year-month
    ("indicator-pack", None),  # handled by _is_indicator_pack
    # negated ascii() of a single char (the min-as-argmax trick)
    ("ascii", re.compile(r"^UnaryMinus\[\w+\] -ascii\(")),
    # array-index arithmetic: a known index column + literal (codebook
    # lookups, posexplode offsets, sequence-lambda indexes — bounded by
    # array/codebook/sequence size)
    (
        "array-index",
        re.compile(
            r"^Add\[\w+\] \((code_\d+#\d*|p#\d*|pos\d+#\d*|from_json.+\.k"
            r"|lambda [a-z]\w*#\d*)"
            r" \+ \d+\)$"
        ),
    ),
    (
        "array-position-offset",
        re.compile(r"^Subtract\[\w+\] \(cast\(array_position\(.* - \d+\)$", re.S),
    ),
    # pmod/remainder by a small LITERAL (bucket ids, parity) — a column
    # modulus is not in the class
    (
        "pmod-small",
        re.compile(r"^(Pmod|Remainder)\[\w+\] .*(% \d+\)|pmod\(.*, \d+\))$", re.S),
    ),
    # complement of a 0/1 indicator: (literal - is_*)
    (
        "indicator-complement",
        re.compile(r"^Subtract\[\w+\] \(\d+ - is_[a-z_]+#\d*\)$"),
    ),
    # negated argmax payload: -array_max(array(struct(sim, -cell/-code)))
    # or the `.nc` negated-code struct field of a materialized argmax —
    # bounded by the literal model size
    (
        "neg-argmax-code",
        re.compile(
            r"^UnaryMinus\[\w+\] -(array_max\(array\(struct\(|\w+#\d*\.nc$)"
        ),
    ),
]

_YM_STRIP = re.compile(
    r"(year|month)\(cast\([a-z_0-9#]+ as date\)\)|(year|month)\([a-z_0-9#]+\)"
)


def _is_year_month_composition(expr: str) -> bool:
    """True iff the flagged arithmetic is composed ONLY of year()/month()
    extractions, integer literals, and +-*() — the calendar class.
    year/month values are <= 9999/12, so any fixed composition of them
    with small literals is bounded."""
    m = re.match(r"^(Add|Subtract|Multiply)\[\w+\] (.*)$", expr, re.S)
    if not m:
        return False
    body = _YM_STRIP.sub("Y", m.group(2))
    if "Y" not in body:
        return False
    return re.fullmatch(r"[Y\d\s()+\-*]+", body) is not None


# condition matcher allows ONE level of nested parens inside the CASE
# predicate (e.g. CASE WHEN ((a + b) <= x) ...) — deeper nesting fails
# safe (unclassified), review finding r14 pass 2
_PACK_STRIP = re.compile(
    r"CASE WHEN \((?:[^()]|\([^()]*\))*\) THEN 1 ELSE 0 END"
)


_I32 = 2**31 - 1


class _PackParser:
    """Interval-arithmetic evaluator over the stripped pack residue
    ({digits, I, + - * ( )}): every indicator occurrence is the
    independent interval [0, 1] and EVERY intermediate subexpression —
    not just the final value — must fit int32. Evaluating only the
    final expression at I=1 was foolable (r14 ADVICE): a pack whose
    large intermediates cancel, e.g. ``(60000*I)*(60000*I) -
    3599999999*I``, evaluates to 1 while its Multiply node overflows at
    runtime, and once signs mix I=1 is not even the worst case.
    Treating repeated occurrences of the same indicator as independent
    [0,1] intervals over-approximates the reachable set — conservative,
    so it can only fail SAFE (into UNCLASSIFIED review), never admit an
    overflowing pack. Grammar: expr := term (('+'|'-') term)*;
    term := unary ('*' unary)*; unary := '-' unary | atom;
    atom := INT | 'I' | '(' expr ')'."""

    def __init__(self, s: str):
        self.toks = re.findall(r"\d+|[I()*+-]", s)
        self.i = 0
        self.ok = True

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _check(self, lo: int, hi: int) -> tuple[int, int]:
        if max(abs(lo), abs(hi)) > _I32:
            self.ok = False
        return (lo, hi)

    def expr(self) -> tuple[int, int]:
        lo, hi = self.term()
        while self._peek() in ("+", "-"):
            op = self._next()
            l2, h2 = self.term()
            if op == "+":
                lo, hi = self._check(lo + l2, hi + h2)
            else:
                lo, hi = self._check(lo - h2, hi - l2)
        return (lo, hi)

    def term(self) -> tuple[int, int]:
        lo, hi = self.unary()
        while self._peek() == "*":
            self._next()
            l2, h2 = self.unary()
            prods = (lo * l2, lo * h2, hi * l2, hi * h2)
            lo, hi = self._check(min(prods), max(prods))
        return (lo, hi)

    def unary(self) -> tuple[int, int]:
        if self._peek() == "-":
            self._next()
            lo, hi = self.unary()
            return self._check(-hi, -lo)
        return self.atom()

    def atom(self) -> tuple[int, int]:
        t = self._next()
        if t == "I":
            return (0, 1)
        if t == "(":
            iv = self.expr()
            if self._next() != ")":
                raise ValueError("unbalanced parens")
            return iv
        if t is not None and t.isdigit():
            return self._check(int(t), int(t))
        raise ValueError(f"unexpected token {t!r}")


def _is_indicator_pack(expr: str) -> bool:
    """True iff the flagged arithmetic is composed ONLY of 0/1 CASE
    indicators, integer literals, and +-*() AND every INTERMEDIATE
    subexpression's interval (each indicator independently in [0,1])
    fits int32 — 'bounded by the sum of the literal weights' is only a
    bound if the weights themselves are checked (review finding:
    2e9-weight packs would have been silently allowlisted while
    ANSI-crashing at runtime), and the intermediates must be checked
    too (r14 ADVICE: final-value eval at I=1 admits packs whose
    overflowing intermediates cancel). Malformed arithmetic fails safe
    into UNCLASSIFIED review."""
    m = re.match(r"^(Add|Subtract|Multiply)\[\w+\] (.*)$", expr, re.S)
    if not m:
        return False
    body = _PACK_STRIP.sub("I", m.group(2))
    if "I" not in body:
        return False
    if re.fullmatch(r"[I\d\s()+\-*]+", body) is None:
        return False
    try:
        p = _PackParser(body)
        p.expr()
        if p.i != len(p.toks):
            return False
    except Exception:  # noqa: BLE001 — malformed arithmetic fails safe
        return False
    return p.ok


_STRUCTURAL = {
    "year-month": _is_year_month_composition,
    "indicator-pack": _is_indicator_pack,
}


def classify_flag(expr: str) -> str | None:
    """Return the bounded-class name for a flagged expression, or None if
    it matches no pinned class (=> a new, unreviewed integer channel)."""
    for name, pat in BOUNDED_CLASSES:
        if pat is None:
            if _STRUCTURAL[name](expr):
                return name
            continue
        if pat.search(expr):
            return name
    return None


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


# --- BIGINT product audit: the wide_int() decision surface ------------------
# (r14 VERDICT task 8.) A BIGINT multiply of two DATA-SCALED operands is
# the n²/n³ overflow class that int32 auditing cannot see: Σrank², n·s2,
# Σcents² all fit int64 only up to a data-cardinality bound, and the
# escape is the DECIMAL(38)/HUGEINT wide_int() channel (a_spearman_rho
# _decimal etc.). This audit walks every Multiply[LongType] node whose
# operands are BOTH non-literal; auto-classifies the shapes bounded by
# construction; and requires every remaining (data×data) product's ENTRY
# to carry an explicit verdict in BIGINT_PRODUCT_BOUNDS — either the
# documented cardinality bound at which int64 saturates (+ the wide_int
# escape pointer) or the fact the entry already IS the wide-int twin.
# tests/test_properties.py pins the coverage: a new entry multiplying two
# data-scaled bigints fails the suite until its bound is written down.

BIGINT_AUTO_CLASSES: list[tuple[str, "re.Pattern[str]"]] = [
    # 0/1 indicator products (bigint-cast window/membership bits)
    (
        "indicator-product",
        re.compile(
            r"^Multiply\[\w+\] \((_h[ab]|in_[a-z_]+|is_[a-z_]+)#\d*L?"
            r" \* (_h[ab]|in_[a-z_]+|is_[a-z_]+)#\d*L?\)$"
        ),
    ),
    # a 0/1 CASE indicator as one factor: the product is bounded by the
    # OTHER operand's own value, which is audited where it is produced
    (
        "case-indicator-factor",
        re.compile(
            r"^Multiply\[\w+\] \(CASE WHEN .* THEN 1 ELSE 0 END \* [^(].*\)$"
            r"|^Multiply\[\w+\] \([^(].* \* CASE WHEN [^()]*(\([^()]*\))?"
            r"[^()]* THEN 1 ELSE 0 END\)$",
            re.S,
        ),
    ),
    # same-column adjacent counts x*(x±1): n² of a per-group cardinality
    # — int64-safe to ~3e9 rows PER GROUP (documented once here; the
    # whole corpus would have to land in one group to saturate). The
    # analyzed plan renders the literal as `cast(1 as bigint)`.
    (
        "pair-count",
        re.compile(
            r"^Multiply\[\w+\] \((\w+)#(\d+)L? \* \(\1#\2L?"
            r" (-|\+) (1|cast\(1 as bigint\))\)\)$"
        ),
    ),
]

# entry name -> the reviewed int64 bound (and, where one exists, the
# wide_int escape twin). An entry listed here states its bound in its
# docstring; a NEW entry whose data×data bigint product fits no
# auto-class and is not listed fails the pytest gate until its bound is
# written down or it switches to the wide_int() DECIMAL(38) channel.
BIGINT_PRODUCT_BOUNDS: dict[str, str] = {
    # --- n^3 channels WITH shipped DECIMAL(38)/HUGEINT twins (r13 t4) ---
    "a_spearman_rho": "n*s2 - s1^2 ~ n^3: int64 to ~2M users; escape = "
    "a_spearman_rho_decimal (wide_int)",
    "a_mann_whitney_u": "tie-corrected z channel ~ n^3: int64 to ~2e9 "
    "doubled-rank units; escape = a_mann_whitney_u_decimal",
    "a_kruskal_wallis": "doubled-rank r2_j <= 2n^2 and cubic tie channel "
    "— the a_mann_whitney_u class: int64 to ~2e9 pooled rows / ~2.1e6 "
    "rows on one cents value; escape = the MW decimal-twin pattern",
    "a_one_way_anova": "Sum(cents^2) moment channel: int64 to ~9e8 events "
    "at the 1e5-cent price domain (the a_welch_t_test class); escape = "
    "wide_int DECIMAL(38)",
    "a_tost_equivalence": "Sum(cents^2) per-arm moment channel: the "
    "a_one_way_anova class (int64 to ~9e8 events; wide_int escape)",
    "t_yule_k": "Sum(c^2) <= N^2 per-source token channel: int64 to ~3e9 "
    "tokens per source; escape = wide_int DECIMAL(38)",
    "w_ulcer_index": "dd_bp^2 <= 1e8 on the calendar-bounded daily frame "
    "(dd_bp is a <=10000 basis-point quotient by construction)",
    "a_gini_by_group": "rank*cents prefix products: int64 to ~9e18/"
    "max_cents rows per nation; escape = a_gini_by_group_decimal",
    # --- n^2-of-count channels, bound stated in the entry docstring ---
    "a_basket_lift": "support*confidence ppm channel ~ n_users^2: int64 "
    "to ~3e6 users; escape = a_basket_lift_decimal",
    "a_capture_recapture": "(n1+1)(n2+1) <= (n+1)^2: int64 to ~3e9 "
    "observed users",
    "a_chi_square_independence": "row*col totals <= n^2: ~3e9 events",
    "a_cohens_kappa": "n^2 and rn*cn marginal products: ~3e9 docs",
    "a_cramers_v": "n*(min(r,c)-1) and r*c cell-total products: ~3e9",
    "a_ks_test": "cum*n ECDF cross-products <= n_a*n_b: ~3e9 per arm",
    "a_welch_t_test": "cnt*cents^2 moment channel: cents bounded by the "
    "price domain (<=1e7), int64 to ~1e5 rows*1e14 — stated at the site",
    "d_dup_cluster_size_histogram": "sz*n_clusters <= n_docs^2: ~3e9",
    "g_degree_centralization": "(n-1)(n-2) and max_k*n: ~3e9 nodes",
    "g_triad_census": "n(n-1)(n-2) triple count and m*(n-2): int64 to "
    "~3e6 graph nodes; wide_int escape documented in the entry",
    "g_degree_gini": "(n+1)*total_degree and rank*k prefix channel: "
    "int64 to ~9e18/max_degree nodes (the m_gini class)",
    "m_gini_coefficient": "(n+1)*total and rank*count: same bound class",
    "m_bollinger_bands": "cnt^2 inside a 7-row window frame: cnt <= 7",
    "m_dow_seasonality_strength": "cnt^2 per dow cell: ~3e9 events/cell",
    "m_interarrival_exponential_ks": "cnt*gap_ms: gaps bounded by the "
    "observation span in ms (~1e10), int64 to ~1e9 events",
    "m_rfm_segmentation": "(n%4)*(n div 4 + 1) ~ n^2/4: ~6e9 users",
    "w_rolling_correlation": "frame moment products n*sxx, sx^2: the "
    "single-series frame is calendar-bounded (row count = day count)",
}


def classify_bigint_flag(expr: str) -> str | None:
    for name, pat in BIGINT_AUTO_CLASSES:
        if pat.search(expr):
            return name
    return None


def _is_literalish(e) -> bool:
    """Literal, or a Cast/UnaryMinus chain ending in a Literal."""
    name = e.getClass().getSimpleName()
    if name == "Literal":
        return True
    if name in ("Cast", "UnaryMinus", "PromotePrecision"):
        ch = e.children()
        return ch.size() == 1 and _is_literalish(ch.apply(0))
    return False


def flag_bigint_products(plan) -> list[str]:
    """Walk a logical plan and return Multiply[LongType] nodes where
    BOTH operands are non-literal (the data×data wide-int surface)."""
    out: list[str] = []
    seen = set()

    def walk_expr(e):
        name = e.getClass().getSimpleName()
        if name == "Multiply":
            try:
                dt = e.dataType().getClass().getSimpleName().replace("$", "")
            except Exception:  # noqa: BLE001 — unresolved exprs
                dt = "?"
            if dt == "LongType":
                ch = e.children()
                kids = [ch.apply(i) for i in range(ch.size())]
                if len(kids) == 2 and not any(_is_literalish(k) for k in kids):
                    key = e.toString()
                    if key not in seen:
                        seen.add(key)
                        out.append(f"Multiply[LongType] ({key[1:-1]})"
                                   if key.startswith("(") else
                                   f"Multiply[LongType] {key}")
        for c in _iter_seq(e.children()):
            walk_expr(c)

    def walk_plan(p):
        for e in _iter_seq(p.expressions()):
            walk_expr(e)
        for c in _iter_seq(p.children()):
            walk_plan(c)
        for c in _iter_seq(p.innerChildren()):
            walk_plan(c)

    walk_plan(plan)
    return out


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

    args = sys.argv[1:]
    bigint_mode = "--bigint" in args
    if bigint_mode:
        args.remove("--bigint")
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = args[1:] or None
    spark = get_spark("int-arith-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = only or sorted(queries)
    n_flagged = 0
    n_unclassified = 0
    errs = []
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            plan = df._jdf.queryExecution().analyzed()
            flags = (
                flag_bigint_products(plan)
                if bigint_mode
                else flag_expressions(plan)
            )
        except Exception as e:  # noqa: BLE001
            errs.append((name, f"{type(e).__name__}: {e}"))
            continue
        for f in flags:
            if bigint_mode:
                cls = classify_bigint_flag(f)
                if cls is None:
                    cls = (
                        "DOCUMENTED"
                        if name in BIGINT_PRODUCT_BOUNDS
                        else "UNREVIEWED"
                    )
            else:
                cls = classify_flag(f) or "UNCLASSIFIED"
            print(f"FLAG {name} [{cls}]: {f}")
            n_flagged += 1
            if cls in ("UNCLASSIFIED", "UNREVIEWED"):
                n_unclassified += 1
    for name, e in errs:
        print(f"ERROR {name}: {e[:200]}")
    kind = "bigint-product" if bigint_mode else "integer-arith"
    print(f"\n{len(names)} entries scanned, {n_flagged} {kind} flags "
          f"({n_unclassified} UNCLASSIFIED/UNREVIEWED), {len(errs)} errors")
    # an entry that ERRORS at plan analysis was never walked — that is
    # an audit failure too, not a clean exit (review finding)
    return 1 if (n_unclassified or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
