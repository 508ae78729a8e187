"""Generate CATALOG.md: one line per catalog entry (oracle status + the
docstring's first sentence). Run after adding entries; CI-free docs."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from surge_spark.queries import all_oracles, all_queries  # noqa: E402

qs, os_ = all_queries(), all_oracles()
groups: dict[str, list[str]] = {}
for name in sorted(qs):
    doc = (qs[name].__doc__ or "").strip().replace("\n", " ")
    while "  " in doc:
        doc = doc.replace("  ", " ")
    first = doc.split(". ")[0]
    if len(first) > 150:  # cut at a word boundary, never mid-word
        first = first[:150].rsplit(" ", 1)[0] + " …"
    prefix = name.split("_", 1)[0]
    mark = "oracle" if name in os_ else "rows-only"
    groups.setdefault(prefix, []).append(f"| `{name}` | {mark} | {first} |")

lines = [
    "# Catalog index",
    "",
    f"{len(qs)} entries, {len(os_)} with full DuckDB value oracles; the",
    "rest are hash-seed/engine-sketch dependent by construction (see the",
    "registry docstring in `surge_spark/queries/__init__.py`). Generated",
    "by `scripts/gen_catalog.py`.",
    "",
]
TITLES = {
    "a": "Aggregation & sketches", "a2": "Latest-per-key", "a8": "Grouped collect",
    "d": "Deduplication", "es": "Event sourcing", "f": "Scalar functions",
    "g": "Graph analytics", "h": "Windows / sessions", "j": "Joins",
    "m": "Metrics & analytics", "mm": "Multimodal", "o": "Sorts / layout / maintenance",
    "p": "Predicates", "p2": "Predicates", "p4": "Predicates", "p5": "Predicates",
    "q": "Subqueries", "q1": "TPC-H", "q3": "TPC-H", "q4": "TPC-H", "q5": "TPC-H",
    "q6": "TPC-H", "q7": "TPC-H", "q8": "TPC-H", "q9": "TPC-H",
    "q10": "TPC-H", "q12": "TPC-H", "q13": "TPC-H", "q14": "TPC-H",
    "q15": "TPC-H", "q16": "TPC-H", "q17": "TPC-H", "q18": "TPC-H",
    "q19": "TPC-H", "q21": "TPC-H", "q22": "TPC-H",
    "s2": "Scans", "s3": "Scans", "s4": "Scans", "set": "Set operations",
    "sim": "Similarity / ANN", "t": "Text / corpus pipeline", "w": "Window functions",
}
merged: dict[str, list[str]] = {}
for prefix, rows in groups.items():
    title = TITLES.get(prefix, prefix)
    merged.setdefault(title, []).extend(rows)
for title in sorted(merged):
    lines += [f"## {title}", "", "| entry | check | summary |", "|---|---|---|"]
    lines += sorted(merged[title]) + [""]
Path("CATALOG.md").write_text("\n".join(lines))

# Keep README's catalog row in sync (it shipped stale once — r7 ADVICE).
import re  # noqa: E402

readme = Path("README.md")
txt = readme.read_text()
new = re.sub(
    r"the declared catalog: \d+ named queries, \d+ with DuckDB oracle SQL",
    f"the declared catalog: {len(qs)} named queries, {len(os_)} with DuckDB oracle SQL",
    txt,
)
if new != txt:
    readme.write_text(new)
    print("README.md catalog row updated")
print(f"CATALOG.md: {len(qs)} entries, {len(os_)} oracled")
