"""Text-analysis stages over a documents table (doc_id, text, ...).

Large-scale training-data-pipeline operators: token counting,
language ID (stopword n-gram heuristic), quality scoring, document
fingerprinting. All vectorized: ``pyarrow.compute`` regex-count
kernels per batch, no per-row Python in the hot path (except the
C-speed crc32/md5 fingerprint loop).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# token = \S+ run; mirrors str.split() counting
_TOKEN_PATTERN = r"\S+"

# GPT-2-style pre-tokenizer, ASCII-safe subset: optional leading space +
# (letters | digits | other-symbol run). Deliberately restricted to
# constructs Python re and RE2 (DuckDB regexp_extract_all) interpret
# identically, so the count has a SQL oracle.
BPE_TOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"

_EN_STOPWORDS = ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was")
_PT_STOPWORDS = ("de", "que", "não", "uma", "para", "com", "os", "do", "da", "em")


def _word_alt_pattern(words) -> str:
    return r"(?i)\b(?:" + "|".join(words) + r")\b"


_EN_RE = _word_alt_pattern(_EN_STOPWORDS)
_PT_RE = _word_alt_pattern(_PT_STOPWORDS)
_PUNCT_RE = r"[.!?,;:]"
_UPPER_RE = r"[A-Z]"


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, n_tokens): whitespace-token counting — vectorized
    count of \\S+ runs (== len(str.split()))."""
    n_tokens = pc.count_substring_regex(batch.column(text_col), _TOKEN_PATTERN)
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pc.cast(n_tokens, pa.int64())],
        names=["doc_id", "n_tokens"],
    )


def bpe_token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, n_bpe_tokens): subword-style pre-token counting via the
    BPE-ish regex — vectorized count kernel."""
    n = pc.count_substring_regex(batch.column(text_col), BPE_TOKEN_PATTERN)
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pc.cast(n, pa.int64())],
        names=["doc_id", "n_bpe_tokens"],
    )


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, pred_lang): stopword-hit language heuristic
    (en vs pt vs unknown)."""
    text = batch.column(text_col)
    en_hits = pc.cast(pc.count_substring_regex(text, _EN_RE), pa.int64())
    pt_hits = pc.cast(pc.count_substring_regex(text, _PT_RE), pa.int64())
    en = en_hits.to_numpy(zero_copy_only=False)
    ptv = pt_hits.to_numpy(zero_copy_only=False)
    pred = np.where(en > ptv, "en", np.where(ptv > en, "pt", "unknown"))
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pa.array(pred, pa.string())],
        names=["doc_id", "pred_lang"],
    )


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, n_chars, n_tokens, punct_ratio, stopword_ratio,
    mean_token_len, quality_score): shallow quality features in the
    spirit of Boilerpipe's text features / C4-style heuristics."""
    text = batch.column(text_col)
    n_chars = pc.cast(pc.utf8_length(text), pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
    n_tokens = (
        pc.cast(pc.count_substring_regex(text, _TOKEN_PATTERN), pa.int64())
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    n_punct = (
        pc.cast(pc.count_substring_regex(text, _PUNCT_RE), pa.int64())
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    n_stop = (
        pc.cast(
            pc.add(
                pc.count_substring_regex(text, _EN_RE), pc.count_substring_regex(text, _PT_RE)
            ),
            pa.int64(),
        )
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    safe_chars = np.maximum(n_chars, 1.0)
    safe_tokens = np.maximum(n_tokens, 1.0)
    punct_ratio = n_punct / safe_chars
    stop_ratio = n_stop / safe_tokens
    # mean token length over non-space chars
    n_space = n_chars - (
        pc.cast(pc.count_substring_regex(text, r"\S"), pa.int64())
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    mean_tok = (n_chars - n_space) / safe_tokens
    # score: in-range boosts for natural text
    score = (
        np.clip(n_tokens / 100.0, 0, 1) * 0.4
        + np.clip(1.0 - np.abs(mean_tok - 5.0) / 5.0, 0, 1) * 0.3
        + np.clip(stop_ratio * 5.0, 0, 1) * 0.2
        + np.clip(1.0 - punct_ratio * 10.0, 0, 1) * 0.1
    )
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(n_chars.astype(np.int64)),
            pa.array(n_tokens.astype(np.int64)),
            pa.array(punct_ratio),
            pa.array(stop_ratio),
            pa.array(mean_tok),
            pa.array(score),
        ],
        names=[
            "doc_id",
            "n_chars",
            "n_tokens",
            "punct_ratio",
            "stopword_ratio",
            "mean_token_len",
            "quality_score",
        ],
    )


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, content_md5, crc32, simhash64): content fingerprints.

    - ``content_md5``: exact-dup key (hex), identical to DuckDB md5().
    - ``crc32``: cheap rolling checksum.
    - ``simhash64``: 64-bit SimHash over whitespace tokens (crc32 token
      hashes splashed to 64 bits), for near-dup hamming search.
    """
    texts = batch.column(text_col).to_pylist()
    md5s, crcs, simhashes = [], [], []
    for t in texts:
        data = (t or "").encode()
        md5s.append(hashlib.md5(data).hexdigest())
        crcs.append(zlib.crc32(data))
        simhashes.append(simhash64(t or ""))
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(md5s, pa.string()),
            pa.array(crcs, pa.uint32()),
            pa.array(simhashes, pa.uint64()),
        ],
        names=["doc_id", "content_md5", "crc32", "simhash64"],
    )


def _splash64(h32: np.ndarray) -> np.ndarray:
    """Spread 32-bit hashes to 64 bits (splitmix64 finalizer)."""
    x = h32.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(31)
    return x


def winnow_fingerprints(text: str, k: int = 8, window: int = 16) -> list:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003): rolling hash over char k-grams, min per window —
    selected hashes locate shared substrings between documents.

    Returns sorted unique selected hashes (uint64)."""
    data = text.encode()
    n = len(data) - k + 1
    if n <= 0:
        return []
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    # polynomial rolling hash via cumulative powers (vectorized)
    base = np.uint64(257)
    pows = np.empty(k, dtype=np.uint64)
    pows[0] = 1
    for i in range(1, k):
        pows[i] = pows[i - 1] * base  # wraps mod 2^64 — fine for a hash
    h = np.zeros(n, dtype=np.uint64)
    for i in range(k):
        h += b[i : i + n] * pows[k - 1 - i]
    h = _splash64(h)
    if n <= window:
        return [int(h.min())]
    # min per sliding window
    from numpy.lib.stride_tricks import sliding_window_view

    mins = sliding_window_view(h, window).min(axis=1)
    return sorted(set(int(x) for x in np.unique(mins)))


def simhash64(text: str) -> int:
    tokens = text.split()
    if not tokens:
        return 0
    h32 = np.fromiter((zlib.crc32(t.encode()) for t in tokens), dtype=np.uint32, count=len(tokens))
    h64 = _splash64(h32)
    bits = ((h64[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    votes = bits.sum(axis=0) * 2 - len(tokens)
    out = np.uint64(0)
    for b in np.nonzero(votes > 0)[0]:
        out |= np.uint64(1) << np.uint64(b)
    return int(out)


def batched_levenshtein(A, B) -> np.ndarray:
    """Unit-cost edit distances for N string pairs at once — the
    Wagner-Fischer DP run row-by-row with the PAIR axis vectorized
    (one (N, maxlen_b) numpy frame per row instead of N scalar DPs).
    The in-row insertion recurrence cur[j] = min(cur[j], cur[j-1]+1)
    collapses to a prefix-min of (cur − j) — no per-column Python.
    Distances are over UTF-8 BYTES, matching DuckDB ``levenshtein()``
    exactly (which is byte-based: levenshtein('ação','') = 6 — verified
    incl. empty strings and multi-byte text). Cost
    O(N·maxlen_a·maxlen_b): size the candidate batch, not the corpus."""
    n = len(A)
    if n == 0:
        return np.array([], np.int64)
    enc = lambda s: np.frombuffer((s or "").encode("utf-8"), np.uint8)  # noqa: E731
    Ae = [enc(a) for a in A]
    Be = [enc(b) for b in B]
    la = np.array([len(x) for x in Ae])
    lb = np.array([len(x) for x in Be])
    maxa, maxb = int(la.max()), int(lb.max())
    Aenc = np.zeros((n, max(maxa, 1)), np.uint8)
    Benc = np.zeros((n, max(maxb, 1)), np.uint8)
    for i, (x, y) in enumerate(zip(Ae, Be)):
        Aenc[i, : len(x)] = x
        Benc[i, : len(y)] = y
    ar = np.arange(maxb + 1)
    prev = np.tile(ar, (n, 1)).astype(np.int64)
    res = np.empty(n, np.int64)
    res[la == 0] = lb[la == 0]
    for i in range(1, maxa + 1):
        sub = prev[:, :-1] + (Aenc[:, i - 1][:, None] != Benc[:, :maxb] if maxb else prev[:, :0])
        cur = np.empty_like(prev)
        cur[:, 0] = i
        if maxb:
            cur[:, 1:] = np.minimum(sub, prev[:, 1:] + 1)
            cur = np.minimum.accumulate(cur - ar, axis=1) + ar
        hit = la == i
        if hit.any():
            res[hit] = cur[hit, lb[hit]]
        prev = cur
    return res


def adjacent_edit_distances(
    ds: "object",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
) -> "object":
    """(doc_a, doc_b, edit_dist) for id-adjacent document pairs within
    each id-hash bucket — the candidate-verification shape of a fuzzy
    dedup pipeline (LSH proposes, edit distance confirms), with a
    deterministic SQL-expressible candidate set so the whole operator
    is oracle-checkable. One bucket shuffle; DP batched per bucket."""
    import pyarrow.compute as pc  # noqa: F401

    def bucketize(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        return b.append_column("bucket", pa.array((ids % n_buckets).astype(np.int64), pa.int64()))

    def pairs(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        texts = g.column(text_col).take(pa.array(order)).to_pylist()
        if len(ids) < 2:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.int64())],
                names=["doc_a", "doc_b", "edit_dist"],
            )
        d = batched_levenshtein(texts[:-1], texts[1:])
        return pa.Table.from_arrays(
            [
                pa.array(ids[:-1].astype(np.int64)),
                pa.array(ids[1:].astype(np.int64)),
                pa.array(d),
            ],
            names=["doc_a", "doc_b", "edit_dist"],
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(pairs, batch_format="pyarrow")
    )


def compression_ratio_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id", level: int = 6
) -> pa.Table:
    """(doc_id, raw_len, zlib_len, ratio_milli) — the zlib
    compression-ratio quality signal (RefinedWeb/MassiveText-style:
    templated spam and boilerplate compress far below natural prose,
    so a low ratio flags machine-generated filler). ``ratio_milli`` =
    floor(1000·zlib_len/raw_len), integer so results are deterministic
    and layout-invariant; empty/null texts get ratio_milli = -1
    in-band. Per-doc compression is the irreducible cost (the same
    per-doc-compute contract as the extraction actors); zlib level is
    pinned so the signal is stable across runs."""
    texts = batch.column(text_col).to_pylist()
    ids = batch.column(id_col)
    raw_len = np.zeros(len(texts), np.int64)
    zlen = np.zeros(len(texts), np.int64)
    for i, t in enumerate(texts):
        if t:
            raw = t.encode("utf-8")
            raw_len[i] = len(raw)
            zlen[i] = len(zlib.compress(raw, level))
    ratio = np.full(len(texts), -1, np.int64)
    nz = raw_len > 0
    ratio[nz] = (1000 * zlen[nz]) // raw_len[nz]
    return pa.table(
        {
            id_col: ids,
            "raw_len": pa.array(raw_len, pa.int64()),
            "zlib_len": pa.array(zlen, pa.int64()),
            "ratio_milli": pa.array(ratio, pa.int64()),
        }
    )


def compression_ratios(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Map-only corpus pass of ``compression_ratio_batch`` (zero
    shuffle)."""
    return ds.map_batches(
        lambda b: compression_ratio_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def token_entropy_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """(doc_id, n_tokens, entropy_milli) — Shannon entropy of each
    document's unigram distribution in milli-nats (⌊1000·H⌋):
    H = ln(dl) − Σ tf·ln(tf)/dl. Low entropy flags repetitive /
    template text the way the Gopher repetition rules do, but in one
    number; high entropy approaches ln(dl) (all tokens distinct).
    Empty/null docs get −1 in-band. Fully vectorized: one tokenize,
    one dictionary encode, one np.unique pair reduction, two
    bincounts — no per-token Python."""
    from pdf_table_extractor_ray.stages.lm import _flat_tokens

    n = batch.num_rows
    flat, lens = _flat_tokens(batch.column(text_col))
    doc_idx = np.repeat(np.arange(n), lens)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(nonempty))
    doc_idx = doc_idx[nonempty]
    dl = np.bincount(doc_idx, minlength=n).astype(np.int64)
    ent = np.full(n, -1.0, np.float64)
    if len(doc_idx):
        dic = flat.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = max(1, len(dic.dictionary))
        upair, tf = np.unique(doc_idx * V + codes, return_counts=True)
        udoc = (upair // V).astype(np.int64)
        mass = np.bincount(udoc, weights=tf * np.log(tf), minlength=n)
        has = dl > 0
        # clamp: H ≥ 0 mathematically, but ln roundoff can land at
        # −2e−16 and floor to −1, colliding with the empty sentinel
        ent[has] = np.maximum(np.log(dl[has]) - mass[has] / dl[has], 0.0)
    entropy_milli = np.where(dl > 0, np.floor(ent * 1000), -1).astype(np.int64)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_tokens": pa.array(dl, pa.int64()),
            "entropy_milli": pa.array(entropy_milli, pa.int64()),
        }
    )


def token_entropies(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Map-only corpus pass of ``token_entropy_batch`` (zero shuffle)."""
    return ds.map_batches(
        lambda b: token_entropy_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
