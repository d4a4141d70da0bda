"""Scale-discipline audit — the anti-pattern scan a 100 TB engine must
keep passing, enforced in CI (tests/test_audit_scale.py runs it).

Checks, over all package source + __ray_entry__.py:

1. no per-row ``Dataset.map(`` (always ``map_batches``/``map_groups``;
   thread/process-pool ``ex/executor/pool.map`` inside a UDF is
   allowed — checked per call site, not per line),
2. no ``batch_format="pandas"`` (Arrow batches are zero-copy from the
   object store; pandas forces a conversion per batch),
3. no ``.iter_rows()`` (driver-side row loops don't distribute),
4. no ``.to_pandas()`` in engine code (full materialization; tests and
   tools may use it on small results),
5. every ``take_all()`` call site is REGISTERED below by (file,
   enclosing function) — each one is a driver materialization point
   and must be bounded by contract (broadcast build sides, drop sets,
   vocab, sketch partials, distinct-value counts). Adding or moving
   one means consciously editing this allowlist with a justification.

Lines that are pure comments are skipped; trailing comments are NOT
stripped (a '#' inside a string/regex literal must not hide code from
the audit — a comment that merely mentions an anti-pattern should be
reworded rather than weakening the scan).

Exit 0 when clean; prints one line per violation otherwise.
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (file, enclosing function) -> why this driver materialization is bounded
TAKE_ALL_ALLOWLIST = {
    (
        "pdf_table_extractor_ray/pipelines/incremental.py",
        "ids_only",
    ): "dedup keep-id broadcast, guarded by the n_keep <= 1M count probe "
    "(hash-shuffle semi join above it)",
    (
        "pdf_table_extractor_ray/stages/kll.py",
        "merge_bucket",
    ): "final KLL merge input: <= 64 bucket sketches x k*log(n/k) "
    "retained items each (KB-scale whatever the corpus)",
    (
        "pdf_table_extractor_ray/stages/mixing.py",
        "neyman_allocation",
    ): "per-stratum sufficient-statistics table, bounded by the "
    "curated stratum axis (same contract as the other allocators)",
    (
        "pdf_table_extractor_ray/stages/snm.py",
        "boundary_only",
    ): "cross-boundary head/tail rows: <= 2*window per partition "
    "(2wP total, KB-scale whatever the corpus)",
    (
        "pdf_table_extractor_ray/stages/unigram_lm.py",
        "subs",
    ): "seed vocabulary: top-k substring pieces (bounded by seed_k) plus "
    "the observed character set (bounded by the script's alphabet)",
    (
        "pdf_table_extractor_ray/stages/unigram_lm.py",
        "e_step",
    ): "EM expected-count table, bounded by the piece vocabulary "
    "(<= seed_k + alphabet rows per round)",
    ("__ray_entry__.py", "partial_min"): "pruned partial-min scan for query vectors",
    ("__ray_entry__.py", "pick"): "k query vectors, bounded by k",
    (
        "pdf_table_extractor_ray/stages/mixing.py",
        "unimax_allocation",
    ): "per-source token-mass table, bounded by the curated source axis",
    (
        "pdf_table_extractor_ray/stages/mixing.py",
        "temperature_allocation",
    ): "per-source token-mass table, bounded by the curated source axis",
    (
        "pdf_table_extractor_ray/stages/similarity.py",
        "weight_partial",
    ): "kmeans_parallel_init candidate weights, bounded by the k-means|| "
    "candidate count (1 + rounds x oversample)",
    ("__ray_entry__.py", "_q_embedding_dups"): "planted-pair result, bounded by pair count",
    ("__ray_entry__.py", "_q_trade_volume_pairs"): "25-row nation dim, pulled once to name the bounded pair axis",
    ("__ray_entry__.py", "_q_hybrid_search_rrf"): "two k=50 top-k ranking lists; fusion axis bounded by 2k",
    ("__ray_entry__.py", "_q_value_trend_by_type"): "one moment row per event_type; closed form needs Python-int precision",
    ("__ray_entry__.py", "count_partial"): "mix_rebalance_sample: one count row per language, bounded lang domain",
    ("__ray_entry__.py", "prep"): "revenue_share_by_nation: one row per nation, bounded; shares need Python-int precision",
    ("__ray_entry__.py", "partial"): "revenue_mom: one row per calendar month, bounded time axis",
    ("pdf_table_extractor_ray/stages/bloom.py", "partial"): "one m/8-byte bitmap per block",
    ("pdf_table_extractor_ray/stages/dedup.py", "drop_by_ids"): "drop set, bounded by dup count",
    ("pdf_table_extractor_ray/stages/dedup.py", "pick"): "adaptive filter probe, bounded",
    ("pdf_table_extractor_ray/stages/joins.py", "broadcast_join"): "build side, bounded by contract",
    ("pdf_table_extractor_ray/stages/joins.py", "adaptive_join"): "build keys, bounded by the count gate (≤ broadcast_max)",
    ("pdf_table_extractor_ray/stages/lm.py", "top_vocab"): "top-V vocab, bounded by V",
    ("pdf_table_extractor_ray/stages/search.py", "bm25_topk"): "per-term df stats, bounded by terms",
    ("pdf_table_extractor_ray/stages/search.py", "tfidf_top_terms"): "df table, bounded by vocab",
    ("pdf_table_extractor_ray/stages/similarity.py", "train_ivf_centroids"): "training sample, bounded by sample_size",
    ("pdf_table_extractor_ray/stages/similarity.py", "score"): "mmr_select candidate pool, ≤ pool rows by global_top_k construction",
    ("pdf_table_extractor_ray/stages/similarity.py", "train_pq_codebooks"): "training sample, bounded by sample_size",
    ("pdf_table_extractor_ray/stages/bpe.py", "top1"): "one best-pair row per block",
    ("pdf_table_extractor_ray/stages/sketches.py", "_key_thresholds"): "heavy_hitters_by: one threshold row per key, bounded key domain",
    ("pdf_table_extractor_ray/stages/sketches.py", "hist"): "kth_smallest: ≤ nbins histogram rows per pass by construction",
    ("pdf_table_extractor_ray/stages/sketches.py", "partial"): "HLL registers / checksum partials, one small row per block",
    ("pdf_table_extractor_ray/stages/sketches.py", "pick"): "cms_point_estimates: ≤ depth·|query keys| sketch cells",
    ("pdf_table_extractor_ray/stages/stats.py", "grouped_minmax_normalize"): "one (min, max) row per group, bounded by group count",
    ("pdf_table_extractor_ray/stages/sketches.py", "sorted_value_counts"): "distinct values of a bounded-cardinality column",
    ("pdf_table_extractor_ray/stages/sketches.py", "to_u"): "kth_smallest_by: one count row per key + ≤ |keys|·nbins histogram rows per pass, bounded key domain",
    ("pdf_table_extractor_ray/pipelines/extract.py", "stats_of"): "per-partition lineage counters",
    (
        "pdf_table_extractor_ray/stages/shuffle.py",
        "hist",
    ): "deterministic_shuffle bucket histogram, exactly n_buckets rows by construction",
    (
        "pdf_table_extractor_ray/stages/dsir.py",
        "to_array",
    ): "DSIR hashed-feature model, ≤ n_buckets rows by hashed_bucket_counts construction",
    (
        "pdf_table_extractor_ray/stages/dsir.py",
        "dsir_log_ratios_paired",
    ): "DSIR paired hashed-feature model, ≤ n_buckets rows by construction",
    (
        "pdf_table_extractor_ray/stages/stats.py",
        "partial",
    ): "borda fusion rank table, Σ per-signal distinct cardinalities (bounded-domain contract)",
    ("pdf_table_extractor_ray/stages/templates.py", "explode"): "mine_template_lines per-key doc totals: one row per key, bounded key (host) domain",
    ("__ray_entry__.py", "_q_template_strip_roundtrip"): "mined template set, ≤ 2 rows per source by the sentinel construction",
    ("pdf_table_extractor_ray/pipelines/corpus_prep.py", "prepare_corpus_v5"): "mined template set, bounded by the min_share recurrence contract (≈ one site template per key)",
    ("pdf_table_extractor_ray/pipelines/sinks.py", "__call__"): "workbook partition keys",
    ("__ray_entry__.py", "_q_revenue_autocorr"): "one row per calendar day, bounded time axis",
    ("pdf_table_extractor_ray/stages/similarity.py", "sum_partial"): "pca: one row per embedding dimension, bounded by d",
    ("pdf_table_extractor_ray/stages/similarity.py", "matvec_partial"): "pca: d·k scatter cells per pass, dimension-bounded",
    ("pdf_table_extractor_ray/stages/zonemap.py", "batch_env"): "one envelope row per parquet file, file-count-bounded",
    ("pdf_table_extractor_ray/stages/zonemap.py", "batch_bloom"): "one 16 KiB bloom row per parquet file, file-count-bounded",
    ("pdf_table_extractor_ray/stages/compaction.py", "rewrite"): "one counter row per output bin, file-count-bounded",
    ("__ray_entry__.py", "keyed"): "compact_small_shards: one (n_rows, checksum) row",
}

_MAP_SITE = re.compile(r"(\w+)?\.map\(")
_MAP_OK_RECEIVERS = {"ex", "executor", "pool"}
_DEF = re.compile(r"\s*def\s+(\w+)")


def _sources():
    yield "__ray_entry__.py"
    pkg = os.path.join(ROOT, "pdf_table_extractor_ray")
    for dirpath, _dirs, files in os.walk(pkg):
        for f in sorted(files):
            if f.endswith(".py"):
                yield os.path.relpath(os.path.join(dirpath, f), ROOT)


def audit() -> list:
    violations = []
    seen_take_all = []
    for rel in _sources():
        func = "<module>"
        with open(os.path.join(ROOT, rel), encoding="utf-8") as fh:
            for lineno, line in enumerate(fh, 1):
                if line.lstrip().startswith("#"):
                    continue
                m = _DEF.match(line)
                if m:
                    func = m.group(1)
                for site in _MAP_SITE.finditer(line):
                    if site.group(1) not in _MAP_OK_RECEIVERS:
                        violations.append(f"{rel}:{lineno}: per-row .map( — use map_batches")
                if 'batch_format="pandas"' in line or "batch_format='pandas'" in line:
                    violations.append(f"{rel}:{lineno}: pandas batch format in engine code")
                if ".iter_rows()" in line:
                    violations.append(f"{rel}:{lineno}: driver-side iter_rows()")
                if ".to_pandas()" in line:
                    violations.append(f"{rel}:{lineno}: to_pandas() in engine code")
                if "take_all()" in line:
                    seen_take_all.append((rel, func, lineno))
    for rel, func, lineno in seen_take_all:
        if (rel, func) not in TAKE_ALL_ALLOWLIST:
            violations.append(
                f"{rel}:{lineno}: take_all() in {func}() is not registered — add "
                "(file, function) to tools/audit_scale.py TAKE_ALL_ALLOWLIST with its bound"
            )
    return violations


def main() -> int:
    v = audit()
    for line in v:
        print(line)
    print("AUDIT:", "clean" if not v else f"{len(v)} violation(s)")
    return 1 if v else 0


if __name__ == "__main__":
    sys.exit(main())
