#!/usr/bin/env python3
"""Regenerate the PLANS.md non-vacuity audit table (round-4 rule: a
threshold/cut-sensitive query must keep rows > 0, bounded well below its
pair space, at EVERY fixture SF — a vacuous gate passes correctness
while testing nothing).

Reads the row counts of each listed query from three Verify dumps:

  python3 scripts/nonvacuity.py out001 out01 out1

where each arg is a Verify outDir (e.g. target/verify_out_sf0.001).
Emits the markdown table on stdout, flagging any zero cell loudly.
"""
import sys

import duckdb

# query -> the cut that could go vacuous (kept in sync with scaladocs)
THRESHOLD_QUERIES = {
    "embed_near_dup": "cos>=0.2",
    "paraphrase_pairs": "cos>=0.35, jac<0.5",
    "semantic_dedup": "cos>=0.35 edges",
    "containment_pairs": "containment>=0.6",
    "embed_outliers": "p5 centroid-cos",
    "heavy_hitters": "Misra-Gries k",
    "minhash_lsh_pairs": "banded minhash",
    "ngram_jaccard_pairs": "jac>=0.5",
    "edit_distance_pairs": "LSH+levenshtein",
    "simhash_near_dup": "hamming<=3",
    "simhash_wide_near_dup": "hamming<=3 (64-bit)",
    "dup_clusters": "CC over LSH pairs",
    "incremental_dedup": "new-vs-seen",
    "line_dedup": "per-doc line sets",
    "decontaminate": "13-gram overlap",
    "image_phash_near_dup": "hamming<=1",
    "cross_modal_check": "text-dup vs media phash",
    "ppjoin_jaccard": "exact jac>=0.5",
    "er_recall_eval": "SNM window recall",
    "fellegi_sunter_er": "match-weight cut",
    "hard_negative_mine": "rank-2..k negatives",
    "preference_pairs": "cluster pairs (usable mix is the gate)",
    "semantic_decontaminate": "cos>=0.35 vs eval set",
    "cdc_chunks": "content-defined cuts",
    "dup_span_runs": "8-gram span hits",
    "contrastive_pairs": "pos/neg mix",
    "gopher_rules": "rule battery",
    "pii_scrub": "pattern hits",
    "lang_id": "lexicon margins",
    "quality_auc": "label split",
    "score_calibration": "bin occupancy",
    "lsh_recall_eval": "truth/candidate overlap",
    "trending_terms": "growth cut",
    "collocation_pmi": "pmi cut",
    "kcenter_coreset": "greedy centers",
    "embed_ann_lsh": "banded probes",
}


# Composite-mix gates whose non-vacuity is a RATIO over the dump, not a
# row count (round-15 verdict task 6 — previously hand-audited in round
# sections). Each entry: (label, SQL returning (num, den), kind).
# kind "filter": the ratio is a CUT — degenerate at 0 (never fires)
# AND at num == den (cuts nothing). kind "metric": the ratio is an
# emitted audit statistic — only 0 is degenerate (saturation is an
# informative reading: k_anonymity 147/147 at sf0.001 just says every
# 500-customer class is under k=3; rrf_fusion 20/20 at small SFs says
# both retrieval legs agree on a tiny corpus — both still discriminate
# the moment the data changes).
RATIO_QUERIES = {
    "k_anonymity": (
        "violating classes",
        "SELECT n_violating, n_classes FROM {T}", "metric"),
    "rrf_fusion": (
        "both-leg overlap",
        "SELECT count(*) FILTER (r_lex IS NOT NULL AND r_dense IS NOT NULL),"
        " count(*) FROM {T}", "metric"),
    "preference_pairs": (
        "usable margin >= 0.05",
        "SELECT count(*) FILTER (usable), count(*) FROM {T}", "filter"),
    "dup_max_spans": (
        "docs with dup spans",
        "SELECT count(*) FILTER (n_spans > 0), count(*) FROM {T}", "filter"),
    "contrastive_pairs": (
        "same-source positive share",
        "SELECT count(*) FILTER (same_source), count(*) FROM {T}", "filter"),
    "gopher_rules": (
        "full-battery pass share",
        "SELECT CAST(sum(n_pass) AS BIGINT), CAST(sum(n_docs) AS BIGINT)"
        " FROM {T}", "filter"),
}


def rows(outdir: str, q: str):
    try:
        return duckdb.sql(
            f"SELECT count(*) FROM '{outdir}/{q}/*.parquet'").fetchone()[0]
    except Exception:
        return None


def ratio(outdir: str, q: str, sql: str):
    try:
        return duckdb.sql(
            sql.replace("{T}", f"'{outdir}/{q}/*.parquet'")).fetchone()
    except Exception:
        return None


def main() -> int:
    d001, d01, d1 = sys.argv[1:4]
    print("| query | cut | sf0.001 | sf0.01 | sf0.1 |")
    print("|---|---|---|---|---|")
    bad = []
    for q, cut in THRESHOLD_QUERIES.items():
        cells = [rows(d, q) for d in (d001, d01, d1)]
        def fmt(c):
            return "MISSING" if c is None else str(c)
        print(f"| {q} | {cut} | {fmt(cells[0])} | {fmt(cells[1])} | {fmt(cells[2])} |")
        if any(c is None or c == 0 for c in cells):
            bad.append((q, cells))
    print("\n| query | ratio gate | sf0.001 | sf0.01 | sf0.1 |")
    print("|---|---|---|---|---|")
    for q, (label, sql, kind) in RATIO_QUERIES.items():
        cells = [ratio(d, q, sql) for d in (d001, d01, d1)]
        def rfmt(c):
            return "MISSING" if c is None else f"{c[0]}/{c[1]}"
        print(f"| {q} | {label} | {rfmt(cells[0])} | {rfmt(cells[1])} | {rfmt(cells[2])} |")
        for c in cells:
            if c is None or c[0] == 0 or (kind == "filter" and c[0] == c[1]):
                bad.append((q, label, cells))
                break
    if bad:
        print(f"\nVACUOUS OR MISSING: {bad}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
