"""Automated physical-plan linter — the 100 TB anti-pattern audit as a
tool instead of a ritual. Builds every registered query at
$SPARK_GRAFT_SF_DIR (default sf0.01), captures `explain("formatted")`,
and lints the node inventory:

HARD flags (exit 1):
  - CartesianProduct          unpartitionable O(n*m) join
  - BatchEvalPython           row-at-a-time Python UDF in the plan
  - unpartitioned Window whose input frame is NOT grain-collapsed
    (no upstream aggregate / top-k limit / bounded-dim scan under the
    Window node) — the single-partition-sort scale-killer
  - Spark-vs-oracle OUTPUT type divergence (Spark decimal column the
    oracle types differently, int-vs-float splits, …) — the
    x_embed_coherence decimal-scale bug class, now machine-checked
  - Filter whose Condition contains a lambdafunction( — a higher-order
    expression evaluated interpreted inside a predicate, the round-9
    x_winnow_candidates re-evaluation bug class
  (unless the query is whitelisted below with a documented reason)

WARN flags (reported, exit 0):
  - BroadcastNestedLoopJoin   fine only when the broadcast side is a
                              1-row/tiny frame (the repo's documented
                              crossJoin discipline); every occurrence
                              is listed so a new unreviewed one is
                              visible in the PLANAUDIT.md diff

Also records per-query shuffle-exchange counts (the scale currency) and
the scan/codegen inventory, then writes PLANAUDIT.md. Usage:

    python tools/planaudit.py            # all queries, writes PLANAUDIT.md
    python tools/planaudit.py x_knn q1   # subset, prints only
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from music_database_spark.registry import load_all  # noqa: E402
from music_database_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Queries allowed to carry a hard-flag node, each with the reason the
# pattern is deliberate there. Anything NOT in this dict fails the audit.
HARD_WHITELIST: dict[str, str] = {}

# Every BroadcastNestedLoopJoin in the registry is a deliberate
# tiny-side crossJoin (BuildLeft/BuildRight with a BroadcastExchange
# under the build side — spot-verified, and independently audited in
# round 5: "every crossJoin broadcasts a 1-row/tiny side"). The reason
# is classified by family; a NEW query landing outside these families
# prints UNREVIEWED and should be inspected.
_BNLJ_FAMILIES: tuple[tuple[tuple[str, ...], str], ...] = (
    (
        ("x_knn", "x_ivf", "x_pq", "x_ann", "x_cluster_kmeans", "x_semantic",
         "x_vec_quantize", "x_embedding", "x_pca"),
        "broadcast packed centroids / codebook / plane literals onto every "
        "row (map-side argmin; index side stays partitioned)",
    ),
    (
        ("x_spatial_join",),
        "two broadcast grid-parameter rows (cell size + offsets) joined "
        "onto the point scan — zero shuffles in the whole plan",
    ),
)

# The scalar-broadcast family can't be recognized by name prefix, so the
# reviewed members are pinned explicitly (the 2026-08 audit's inventory).
# A BNLJ in any query NOT matched by a family and NOT in this set gets
# UNREVIEWED — the signal this report exists to raise.
_BNLJ_SCALAR_REVIEWED = frozenset(
    {
        "q17_idle_customers", "x_acf", "x_assoc_rules", "x_benford",
        "x_bm25_search", "x_bpe_train", "x_calibration", "x_cms_join_size",
        "x_collocations",
        # round-12: the 1-row exact-gap-sum broadcast plus
        # two_level_rank's grand-total broadcast
        "x_conversion_time",
        "x_cusum_changepoint", "x_dedup_recall",
        "x_dsir_weights", "x_expectations", "x_histogram",
        # round-8 rewrite: vc.crossJoin(broadcast(n_tot)) where n_tot is
        # the 1-row global SUM(c) (operators/quality.py x_histogram_equidepth)
        "x_histogram_equidepth", "x_interpolate",
        "x_interval_overlap", "x_kmv_setops", "x_ks_drift", "x_ks_test",
        "x_length_mixture", "x_lorenz_curve", "x_minhash_band_tuning",
        "x_modularity", "x_ndcg", "x_ngram_lm_score", "x_ngram_novelty",
        "x_null_safe_join",
        "x_pagerank", "x_poisson_bootstrap", "x_quantile_binning",
        "x_rfm_segmentation", "x_rolling_distinct_exact", "x_seasonal_dow",
        "x_segmented_regression", "x_skew_profile", "x_sql_table_udf",
        "x_t_closeness", "x_tfidf", "x_theilsen_slope",
        "x_window_ignore_nulls",
    }
)


def bnlj_reason(name: str) -> str:
    for prefixes, reason in _BNLJ_FAMILIES:
        if name.startswith(prefixes):
            return reason
    if name in _BNLJ_SCALAR_REVIEWED:
        return (
            "1-row global aggregate / tiny literal frame broadcast back "
            "onto rows (the registry's scalar-broadcast recipe)"
        )
    return "UNREVIEWED — inspect"

NODE_RE = re.compile(r"^\(\d+\) ([A-Za-z][A-Za-z0-9_]*)")
_ORDER_SPEC_RE = re.compile(r"\b(ASC|DESC) NULLS (FIRST|LAST)\b")
TREE_RE = re.compile(r"^(?P<prefix>[ :+\-|*]*)(?P<name>[A-Za-z][A-Za-z0-9_]*)")
ID_RE = re.compile(r"\((\d+)\)")

# Node names that prove the frame entering an unpartitioned Window is
# bounded regardless of the data size: an explicit row-count limit.
_LIMIT_COLLAPSERS = ("TakeOrderedAndProject", "GlobalLimit", "CollectLimit")

# Aggregate node names. Round-12 tightening (round-11 verdict ask #3):
# an upstream aggregate is NO LONGER boundedness proof by itself —
# aggregation collapses grain, not cardinality (a per-customer or
# per-document aggregate grows linearly with the data, and an
# unpartitioned window over it is a single-task sort at 100x). An
# aggregate counts as a collapser only when its GROUP KEYS come from a
# bounded domain: no keys at all (global aggregate -> <=1 row), or
# every key column named in _BOUNDED_KEY_NAMES. Everything else needs a
# WINDOW_WHITELIST entry with a written reason.
_AGG_NODES = (
    "HashAggregate", "SortAggregate", "ObjectHashAggregate",
    "ArrowAggregatePython",
)

# Group-key column names whose value domain is bounded by construction,
# independent of data volume. Each entry carries its boundedness
# argument; tests/test_tools_gates.py pins the set.
_BOUNDED_KEY_NAMES = {
    # two_level_rank bucket id: 0..nb-1 with nb <= 256 (ranking.py
    # _MAX_BOUNDS) — the offsets window this lint is DESIGNED to allow
    "__bkt",
}

# Parquet tables small-by-construction (dimension carriers): a window
# over ONLY these scans is bounded even without an aggregate.
_BOUNDED_TABLES = ("nation.parquet", "region.parquet")

# Queries allowed an unpartitioned Window over a frame the node
# inventory can't prove bounded, each with the reviewed reason it is.
# Populated by the round-12 tightening sweep (every other query the old
# any-aggregate leniency sheltered was CONVERTED: rfm/conversion_time/
# ndcg/zipf per the verdict ask, plus the value-grid ECDF family
# ks_test/ks_drift/mann_whitney/auc_roc). A test pins non-emptiness of
# every reason.
_CAL = (
    "calendar-grain rollup: frame cardinality = the dataset's day/"
    "month span (TPC-H dates span a fixed 7-year window, ~2.4k days), "
    "which grows with time coverage, not data volume; per-entity "
    "variants would PARTITION BY entity"
)
WINDOW_WHITELIST: dict[str, str] = {
    "x_percent_change": _CAL + " (month grain)",
    "x_cusum_changepoint": _CAL,
    "x_segmented_regression": _CAL,
    "x_ewma_smooth": _CAL,
    "x_rolling_slope": _CAL,
    "x_crosscorr": _CAL,
    "x_forecast_snaive": _CAL,
    "x_rolling_distinct_hll": _CAL + " (daily HLL sketch rollup)",
    "x_skyline": (
        "window runs over the per-date frontier-candidate champions — "
        "date-domain grain (~2.4k rows at any SF, the fixed TPC-H "
        "calendar), the classic local-prune/global-merge skyline split"
    ),
    "x_chi2_independence": (
        "contingency cells of two bounded enums (c_mktsegment x "
        "o_orderpriority, <= 25 rows at any scale)"
    ),
    "x_poisson_bootstrap": (
        "rank window over the B bootstrap replicate means — "
        "constant-cardinality frame (BOOT_B literal)"
    ),
    "x_temperature_sample": (
        "per-language frame — lang is a bounded enum (ISO language "
        "inventory, a few hundred values at planetary scale)"
    ),
    "x_token_budget": (
        "per-source frame — source is a bounded enum of corpus "
        "provenances (crawl/curated/... catalog, not data-sized)"
    ),
}


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_nodes(text: str) -> list[str]:
    nodes = []
    for line in text.splitlines():
        m = NODE_RE.match(line.strip())
        if m:
            nodes.append(m.group(1))
    return nodes


def _split_top_brackets(s: str) -> list[str]:
    """Top-level [...] groups of a formatted Arguments line."""
    groups, depth, cur = [], 0, []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def _detail_blocks(lines: list[str]) -> list[tuple[int, str, list[str]]]:
    """(node_id, header_line, block_lines) for every '(N) Name' detail
    header; a block runs until the NEXT detail header (or EOF), never a
    fixed line count — formatted details vary in length (long Input
    lists push Arguments/Location arbitrarily far down)."""
    headers = [
        (i, int(m.group(1)))
        for i, line in enumerate(lines)
        if (m := re.match(r"^\((\d+)\) [A-Za-z]", line.strip()))
    ]
    blocks = []
    for k, (i, nid) in enumerate(headers):
        end = headers[k + 1][0] if k + 1 < len(headers) else len(lines)
        blocks.append((nid, lines[i].strip(), lines[i:end]))
    return blocks


def unpartitioned_window_findings(text: str) -> list[str]:
    """Lint (a): every Window node with an EMPTY partition spec must sit
    above a grain-collapsing subtree (aggregate / top-k / bounded-dim
    scans only). Returns ['Window(id): reason', ...] for violations.

    Works off explain("formatted"): the tree section gives structure
    (indent depth), the details section gives each Window's
    Arguments: [exprs], [partitionSpec], [orderSpec]. FAILS CLOSED: a
    Window whose partition spec can't be extracted, or a parquet Scan
    whose Location can't, is itself a finding — a silent parse miss must
    not let a real violation through (advisor-flagged fail-open)."""
    lines = text.splitlines()
    # --- tree section: (depth, name, id) until the first blank-then-details
    tree = []  # (line_idx, depth, name, id)
    for i, line in enumerate(lines):
        if NODE_RE.match(line.strip()):
            break  # details section reached
        m = TREE_RE.match(line)
        if not m:
            continue
        idm = ID_RE.search(line)
        if not idm:
            continue
        tree.append((len(m.group("prefix")), m.group("name"), int(idm.group(1))))
    findings = []
    # --- details: window id -> partition spec emptiness; parquet scan
    # id -> Location line. Both parsed over full detail blocks.
    part_empty: dict[int, bool] = {}
    scan_loc: dict[int, str] = {}
    parquet_scan_ids: set[int] = set()
    agg_bounded: dict[int, bool] = {}  # agg node id -> keys bounded-domain
    for nid, header, block in _detail_blocks(lines):
        am = re.match(r"^\(\d+\) (\w+)", header)
        if am and am.group(1) in _AGG_NODES:
            # Keys line: 'Keys [2]: [a#5, b#8]' or 'Keys: []'. Unparseable
            # keys fail closed (not a collapser).
            bounded = False
            for line in block[1:]:
                ls = line.strip()
                if ls.startswith("Keys"):
                    groups = _split_top_brackets(ls[len("Keys"):])
                    inner = groups[-1].strip() if groups else None
                    if inner == "":
                        bounded = True  # global aggregate -> <=1 row
                    elif inner is not None:
                        names = [
                            k.strip().split("#")[0].strip("`")
                            for k in inner.split(",")
                        ]
                        bounded = all(k in _BOUNDED_KEY_NAMES for k in names)
                    break
            agg_bounded[nid] = bounded
        if re.match(r"^\(\d+\) Window\b", header):
            spec_empty = None
            for line in block[1:]:
                ls = line.strip()
                if ls.startswith("Arguments:"):
                    groups = _split_top_brackets(ls[len("Arguments:"):])
                    # The formatted printer OMITS empty field lists:
                    # 3 groups = [exprs],[partition],[order]; 2 = exprs +
                    # exactly one of partition/order (an order spec always
                    # carries 'ASC/DESC NULLS FIRST/LAST'); 1 = exprs only
                    # (both empty). The old 'len>=3 else skip' rule was
                    # blind to the 2- and 1-group unpartitioned shapes.
                    if len(groups) >= 3:
                        spec_empty = groups[-2].strip() == ""
                    elif len(groups) == 2:
                        spec_empty = bool(_ORDER_SPEC_RE.search(groups[1]))
                    elif len(groups) == 1:
                        spec_empty = True
                    break
            if spec_empty is None:
                findings.append(
                    f"Window({nid}): partition spec unparseable from formatted "
                    f"details — parse failure (fail closed)"
                )
                part_empty[nid] = False  # already reported; don't double-flag
            else:
                part_empty[nid] = spec_empty
        elif re.match(r"^\(\d+\) Scan parquet", header):
            parquet_scan_ids.add(nid)
            for line in block[1:]:
                if line.strip().startswith("Location:"):
                    scan_loc[nid] = line
                    break
    # --- per-window subtree check
    for idx, (depth, name, nid) in enumerate(tree):
        if name != "Window" or not part_empty.get(nid, False):
            continue
        subtree = []
        for d2, n2, id2 in tree[idx + 1:]:
            if d2 <= depth:
                break
            subtree.append((n2, id2))
        if any(n in _LIMIT_COLLAPSERS for n, _ in subtree):
            continue
        if any(
            n in _AGG_NODES and agg_bounded.get(id2, False) for n, id2 in subtree
        ):
            continue
        scans = [id2 for n2, id2 in subtree if n2 == "Scan"]
        parquet_scans = [s for s in scans if s in parquet_scan_ids]
        unlocated = [s for s in parquet_scans if s not in scan_loc]
        if unlocated:
            findings.append(
                f"Window({nid}): parquet Scan {unlocated} Location unparseable "
                f"— parse failure (fail closed)"
            )
            continue
        if parquet_scans and all(
            any(t in scan_loc[s] for t in _BOUNDED_TABLES) for s in parquet_scans
        ):
            continue
        if not parquet_scans:
            # only LocalTableScan / ExistingRDD / Range literal frames
            if all(n2 in ("LocalTableScan", "Scan", "Range", "InMemoryTableScan",
                          "InMemoryRelation", "Project", "Filter", "Sort", "Exchange",
                          "Generate", "Expand", "Union", "AdaptiveSparkPlan",
                          "BroadcastExchange", "BroadcastHashJoin",
                          "BroadcastNestedLoopJoin", "ReusedExchange") for n2, _ in subtree):
                continue
        findings.append(
            f"Window({nid}): empty partition spec over a non-collapsed frame "
            f"(subtree: {[n for n, _ in subtree][:8]})"
        )
    return findings


# --- Lint (b): Spark output schema vs DuckDB oracle DESCRIBE parity ----

_DUCK_INT = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT")


def type_parity_findings(schema, duck_cols: list[tuple[str, str]]) -> list[str]:
    """Compare Spark result schema against DuckDB DESCRIBE of the oracle.
    The driver stringifies both sides (floats via repr()), so the lint
    flags exactly the pairs whose stringification can diverge while the
    values are equal: decimal-vs-anything (scale truncation class),
    int-vs-float splits, and kind mismatches."""
    spark_types = {f.name: f.dataType.simpleString() for f in schema.fields}
    duck_types = {c: t.upper() for c, t in duck_cols}
    findings = []
    if sorted(spark_types) != sorted(duck_types):
        return [f"column sets differ: spark={sorted(spark_types)} oracle={sorted(duck_types)}"]
    for col, st in sorted(spark_types.items()):
        dt = duck_types[col]
        if st.startswith("decimal"):
            # oracle DECIMAL outputs are already banned by diffcheck; a
            # Spark-side decimal output therefore always diverges in
            # stringification (Decimal('1.50') vs repr float '1.5').
            findings.append(f"{col}: spark {st} vs oracle {dt} — cast the Spark output")
        elif st in ("double", "float"):
            if not any(k in dt for k in ("DOUBLE", "FLOAT", "REAL")):
                findings.append(f"{col}: spark {st} vs oracle {dt} (float-vs-int split)")
        elif st in ("bigint", "int", "smallint", "tinyint"):
            if dt not in _DUCK_INT:
                findings.append(f"{col}: spark {st} vs oracle {dt} (int-vs-{dt} split)")
        elif st == "string":
            if "VARCHAR" not in dt and "STRING" not in dt:
                findings.append(f"{col}: spark string vs oracle {dt}")
        elif st == "date":
            if dt != "DATE":
                findings.append(f"{col}: spark date vs oracle {dt}")
        elif st.startswith("timestamp"):
            if "TIMESTAMP" not in dt:
                findings.append(f"{col}: spark {st} vs oracle {dt}")
        elif st == "boolean":
            if dt != "BOOLEAN":
                findings.append(f"{col}: spark boolean vs oracle {dt}")
        elif st.startswith(("array", "map", "struct")):
            if not any(k in dt for k in ("[]", "LIST", "MAP", "STRUCT")):
                findings.append(f"{col}: spark {st} vs oracle {dt}")
    return findings


# --- Lint (c): higher-order expressions inside Filter predicates -------

# Filters evaluating a HOF (lambdafunction in the Condition) run
# INTERPRETED — Predicates never whole-stage-codegen HOFs — and, when the
# array is computed rather than scanned, re-evaluate the whole array
# pipeline per row. That is the round-9 x_winnow_candidates bug class
# (199 s -> 3.7 s; PLANS.md "inferred-filter re-evaluation trap"): the
# generating rule is excluded session-wide, so any recurrence here means
# a NEW inference path or a hand-written expensive filter — both worth a
# hard stop. Reviewed legitimate sites go here with their reason.
_HOF_FILTER_REVIEWED: dict[str, str] = {}


def hof_filter_findings(text: str) -> list[str]:
    """['Filter(id): <condition head>'] for every Filter detail block
    whose Condition contains a lambdafunction( — a higher-order
    expression evaluated interpreted inside a predicate."""
    findings = []
    for nid, header, block in _detail_blocks(text.splitlines()):
        if not re.match(r"^\(\d+\) Filter", header):
            continue
        body = " ".join(ln.strip() for ln in block)
        if "lambdafunction(" in body:
            cond = body.split("Condition :", 1)[-1].strip()
            findings.append(f"Filter({nid}): HOF in predicate: {cond[:140]}")
    return findings


def main() -> int:
    names = sys.argv[1:]
    registry = load_all()
    unknown = [n for n in names if n not in registry]
    if unknown:
        print(f"unknown query name(s): {unknown}", file=sys.stderr)
        return 2
    todo = {n: s for n, s in registry.items() if (n in names if names else True)}
    spark = get_spark("planaudit")
    import duckdb

    from music_database_spark.sources.loader import DRIVER_TABLES

    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    rows = []
    hard_fail = []
    for name, spec in todo.items():
        try:
            df = spec.build(spark, SF_DIR)
            text = formatted_plan(df)
            nodes = plan_nodes(text)
        except Exception as e:  # build or explain failure is itself a finding
            hard_fail.append((name, f"build/explain error: {type(e).__name__}: {str(e)[:160]}"))
            continue
        if name not in WINDOW_WHITELIST:
            for w in unpartitioned_window_findings(text):
                hard_fail.append((name, w))
        if name not in _HOF_FILTER_REVIEWED:
            for w in hof_filter_findings(text):
                hard_fail.append((name, w))
        if spec.oracle:
            try:
                duck_cols = [
                    (c, t) for c, t, *_ in con.execute(f"DESCRIBE {spec.oracle}").fetchall()
                ]
                for w in type_parity_findings(df.schema, duck_cols):
                    hard_fail.append((name, f"type parity: {w}"))
            except Exception as e:
                hard_fail.append((name, f"oracle DESCRIBE error: {str(e)[:160]}"))
        counts = {n: nodes.count(n) for n in set(nodes)}
        shuffles = counts.get("Exchange", 0)
        # the formatted node "Scan parquet <table>" tokenizes to "Scan";
        # this also counts any non-parquet Scan node, which is what the
        # column means.
        scans = counts.get("Scan", 0)
        cart = counts.get("CartesianProduct", 0)
        row_py = counts.get("BatchEvalPython", 0)
        bnlj = counts.get("BroadcastNestedLoopJoin", 0)
        arrow = sum(
            v
            for k, v in counts.items()
            # Sanctioned Python: Arrow-batched stages, plus the Python
            # UDTF surface (BatchEvalPythonUDTF — a distinct node from the
            # hard-flagged row-UDF BatchEvalPython; the UDTF API is the
            # demonstrated surface and buffers rows per batch).
            if k.startswith(("ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas",
                             "FlatMapCoGroupsInPandas", "ArrowAggregatePython",
                             "BatchEvalPythonUDTF"))
        )
        if cart and name not in HARD_WHITELIST:
            hard_fail.append((name, f"CartesianProduct x{cart}"))
        if row_py and name not in HARD_WHITELIST:
            hard_fail.append((name, f"BatchEvalPython x{row_py} (row-at-a-time Python)"))
        # An unreviewed BNLJ is a HARD failure, not a table annotation: a
        # ledger that ships an "UNREVIEWED — inspect" row defeats its
        # purpose (round-8 verdict). New BNLJ sites must be classified in
        # _BNLJ_FAMILIES / _BNLJ_SCALAR_REVIEWED before the audit passes.
        if bnlj and bnlj_reason(name).startswith("UNREVIEWED"):
            hard_fail.append(
                (name, f"BroadcastNestedLoopJoin x{bnlj} UNREVIEWED — classify "
                       f"it in planaudit.py's reviewed inventory")
            )
        rows.append(
            {
                "name": name,
                "shuffles": shuffles,
                "scans": scans,
                "bnlj": bnlj,
                "arrow": arrow,
                "cartesian": cart,
                "row_python": row_py,
            }
        )
    rows.sort(key=lambda r: (-r["shuffles"], r["name"]))
    bnlj_rows = [r for r in rows if r["bnlj"]]

    lines = [
        "# PLANAUDIT — automated physical-plan lint",
        "",
        f"`python tools/planaudit.py` over {len(rows)} registered queries at "
        f"`{SF_DIR}` (regenerate after adding operators; CI for the 100 TB",
        "anti-pattern discipline: no cartesian products, no row-at-a-time",
        "Python, every BroadcastNestedLoopJoin reviewed as a tiny-side",
        "broadcast).",
        "",
        f"- hard flags (CartesianProduct / BatchEvalPython / HOF-in-Filter): **{len(hard_fail)}**",
        f"- BroadcastNestedLoopJoin occurrences (reviewed tiny-side "
        f"crossJoins): **{len(bnlj_rows)}**",
        f"- Arrow-batched Python stages (the sanctioned Python path): "
        f"**{sum(1 for r in rows if r['arrow'])}** queries",
        "",
    ]
    if hard_fail:
        lines += ["## HARD FLAGS", ""]
        lines += [f"- `{n}`: {why}" for n, why in hard_fail]
        lines += [""]
    if bnlj_rows:
        lines += [
            "## BroadcastNestedLoopJoin sites",
            "",
            "| query | BNLJ nodes | shuffles | reviewed reason |",
            "|---|---|---|---|",
        ]
        for r in bnlj_rows:
            lines.append(
                f"| {r['name']} | {r['bnlj']} | {r['shuffles']} | {bnlj_reason(r['name'])} |"
            )
        lines += [""]
    lines += [
        "## Shuffle-heaviest plans (top 15)",
        "",
        "| query | shuffle exchanges | scan nodes | arrow stages |",
        "|---|---|---|---|",
    ]
    for r in rows[:15]:
        lines.append(
            f"| {r['name']} | {r['shuffles']} | {r['scans']} | {r['arrow']} |"
        )
    lines += [
        "",
        f"Median shuffle count: "
        f"{sorted(r['shuffles'] for r in rows)[len(rows) // 2] if rows else 0}; "
        f"{sum(1 for r in rows if r['shuffles'] == 0)} map-only plans.",
        "",
    ]
    report = "\n".join(lines)
    if not names:
        with open(os.path.join(REPO, "PLANAUDIT.md"), "w") as f:
            f.write(report)
    print(report)
    for n, why in hard_fail:
        print(f"HARD  {n}: {why}")
    print(f"{len(rows)} plans audited, {len(hard_fail)} hard flags")
    return 1 if hard_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
