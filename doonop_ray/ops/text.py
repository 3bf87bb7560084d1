"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline staples (language-ID heuristic, quality scoring,
token counting, fingerprinting, vocabulary stats).

All hot paths are vectorized pyarrow/RE2 kernels inside map_batches;
every computation has an exactly-matching DuckDB oracle (same RE2 regex
engine on both sides).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .common import _ensure_cols, finish, r4, read

TOKEN_RE = r"\w+"

# tiny per-language stopword marker sets for the heuristic language ID
LANG_MARKERS = [
    ("en", ("the", "and", "of", "to", "is")),
    ("de", ("der", "und", "die", "das", "ist")),
    ("fr", ("le", "la", "et", "les", "est")),
    ("es", ("el", "la", "de", "que", "es")),
]
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "for")


def _count_re(t: pa.Table, col: str, pattern: str) -> pa.Array:
    return pc.count_substring_regex(t[col], pattern)


def token_counts(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_tokens) — \\w+ token count per document."""
    out = (
        read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "n_tokens": pc.cast(_count_re(t, "text", TOKEN_RE), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    return finish(out, ["doc_id"])


def quality_scores(sf_dir: str) -> pd.DataFrame:
    """Heuristic quality signals: lengths, stopword hits/ratio, verdict.

    All-integer signals except the ratio (rounded 4), so the oracle
    comparison is exact."""

    def score(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        lt = pa.table({"low": low})
        n_tokens = pc.cast(_count_re(lt, "low", TOKEN_RE), pa.int64())
        stop_pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
        n_stop = pc.cast(_count_re(lt, "low", stop_pat), pa.int64())
        n_chars = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        ratio = r4(
            n_stop.to_numpy(zero_copy_only=False)
            / np.maximum(1, n_tokens.to_numpy(zero_copy_only=False))
        )
        nt = n_tokens.to_numpy(zero_copy_only=False)
        ns = n_stop.to_numpy(zero_copy_only=False)
        is_q = (nt >= 10) & (nt <= 1000) & (ns > 0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "n_stopwords": n_stop,
                "stop_ratio": pa.array(ratio, pa.float64()),
                "is_quality": pa.array(is_q),
            }
        )

    out = (
        read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(score, batch_format="pyarrow")
        .to_pandas()
    )
    return finish(out, ["doc_id"])


def lang_guess(sf_dir: str) -> pd.DataFrame:
    """N-gram-free stopword-marker language ID. Ties break in LANG_MARKERS
    order (en > de > fr > es) — the oracle CASE expression mirrors it."""

    def guess(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        lt = pa.table({"low": low})
        scores = {}
        for lang, words in LANG_MARKERS:
            pat = r"\b(" + "|".join(words) + r")\b"
            scores[lang] = _count_re(lt, "low", pat).to_numpy(zero_copy_only=False)
        s = np.stack([scores[l] for l, _ in LANG_MARKERS])  # (4, n)
        idx = np.argmax(s, axis=0)  # first max wins = marker order
        langs = np.array([l for l, _ in LANG_MARKERS])
        cols = {"doc_id": t["doc_id"], "guess": pa.array(langs[idx])}
        for lang, _ in LANG_MARKERS:
            cols[f"s_{lang}"] = pa.array(scores[lang].astype(np.int64))
        return pa.table(cols)

    out = (
        read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(guess, batch_format="pyarrow")
        .to_pandas()
    )
    return finish(out, ["doc_id"])


def doc_fingerprints(sf_dir: str) -> pd.DataFrame:
    """MD5 fingerprint of whitespace-normalized lowercase text."""

    def fp(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        norm = pc.replace_substring_regex(low, r"\s+", " ")
        fps = [hashlib.md5(s.encode()).hexdigest() for s in norm.to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "fp": pa.array(fps, pa.string())})

    out = (
        read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(fp, batch_format="pyarrow")
        .to_pandas()
    )
    return finish(out, ["doc_id"])


def top_tokens(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Global top-k token frequencies: per-batch partial counts (flat
    token explode stays inside the batch) → ``grouped_aggregate``
    (vectorized high-cardinality reduce: at web-corpus vocabulary sizes
    Ray's per-group reduce is 12× slower, measured at 500k keys) →
    sort."""
    from .common import grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        all_tokens = pc.split_pattern_regex(low, r"\W+")
        flat = pc.list_flatten(all_tokens)
        flat = flat.filter(pc.not_equal(flat, ""))
        tt = pa.table({"token": flat})
        return tt.group_by("token").aggregate([([], "count_all")])

    partials = read(sf_dir, "documents", ["text"]).map_batches(
        partial, batch_format="pyarrow")
    merged = grouped_aggregate(partials, "token", [("count_all", "sum")])

    def block_top(t: pa.Table) -> pa.Table:
        # per-block partial top-k: the vocabulary-sized aggregate never
        # reaches the driver (blocks × k rows do)
        idx = pc.sort_indices(t, sort_keys=[("count_all_sum", "descending"),
                                            ("token", "ascending")])
        return t.take(idx.slice(0, min(k, len(t))))

    out = (
        merged.map_batches(block_top, batch_format="pyarrow",
                           batch_size=None)
        .to_pandas()
        .rename(columns={"count_all_sum": "n"})
    )
    out = out.sort_values(["n", "token"], ascending=[False, True],
                          kind="mergesort").head(k)
    return out.reset_index(drop=True)


def deterministic_sample(sf_dir: str) -> pd.DataFrame:
    """Hash-based deterministic sampling (stratified-sampling building
    block): keep documents whose md5(text) starts with '0' or '1' — a
    reproducible ~1/8 sample any engine can agree on exactly."""

    def samp(t: pa.Table) -> pa.Table:
        keep = [
            hashlib.md5(x.encode()).hexdigest()[0] in ("0", "1")
            for x in t["text"].to_pylist()
        ]
        # explicit bool type: pa.array([]) is null-typed and filter()
        # rejects it on the zero-row batch an empty corpus produces
        return t.filter(pa.array(keep, pa.bool_())).select(
            ["doc_id", "lang"])

    out = (
        read(sf_dir, "documents", ["doc_id", "lang", "text"])
        .map_batches(samp, batch_format="pyarrow")
        .to_pandas()
    )
    return finish(out, ["doc_id"])


def doc_length_histogram(sf_dir: str, bucket: int = 100) -> pd.DataFrame:
    """Histogram of document lengths (n_chars bucketed to ``bucket``):
    vectorized bucket key + partial per-batch counts before the tiny
    groupby shuffle."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        b = pc.multiply(
            pc.divide(pc.cast(t["n_chars"], pa.int64()), bucket), bucket)
        return pa.table({"bucket": b}).group_by("bucket").aggregate(
            [("bucket", "count")])

    out = (
        read(sf_dir, "documents", ["n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("bucket_count", alias_name="n_docs"))
        .to_pandas()
    )
    out = _ensure_cols(out, {"bucket": "int64", "n_docs": "int64"})
    return finish(out, ["bucket"])


def curate_documents(sf_dir: str) -> pd.DataFrame:
    """The training-data CURATION pipeline end-to-end, composed from the
    suite's own stages in ONE scan + one short-key shuffle: keep
    documents that (a) pass the quality gate (10 <= tokens <= 1000 with
    at least one stopword — ``quality_scores`` semantics), (b) are
    English under the marker heuristic (``lang_guess`` semantics: en
    wins ties), and (c) survive prefix dedup (min doc_id per first-3-
    token key among the QUALIFYING docs — ``dedup_prefix`` semantics).
    The filters run inside map_batches so only (doc_id, prefix-key)
    survivors reach the ``grouped_aggregate`` shuffle."""
    from .common import grouped_aggregate, table_rows

    def qualify(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        lt = pa.table({"low": low})
        n_tokens = _count_re(t, "text", TOKEN_RE).to_numpy(zero_copy_only=False)
        stop_pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
        n_stop = _count_re(lt, "low", stop_pat).to_numpy(zero_copy_only=False)
        scores = []
        for _, words in LANG_MARKERS:
            pat = r"\b(" + "|".join(words) + r")\b"
            scores.append(_count_re(lt, "low", pat).to_numpy(zero_copy_only=False))
        s = np.stack(scores)  # (4, n) — row 0 is en; first max wins
        ok = ((n_tokens >= 10) & (n_tokens <= 1000) & (n_stop > 0)
              & (np.argmax(s, axis=0) == 0))
        toks = pc.split_pattern_regex(low, r"\W+").to_pylist()
        keys = [" ".join([w for w in l if w][:3]) for l in toks]
        return pa.table({
            "doc_id": t["doc_id"],
            "k": pa.array(keys, pa.string()),
        }).filter(pa.array(ok))

    keyed = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        qualify, batch_format="pyarrow")
    out = (
        grouped_aggregate(keyed, "k", [("doc_id", "min")],
                          size_hint=table_rows(sf_dir, "documents"))
        .to_pandas()
        .rename(columns={"doc_id_min": "doc_id"})[["doc_id"]]
    )
    return finish(out, ["doc_id"])


def sample_per_lang(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Deterministic STRATIFIED sample: the k docs per ``lang`` stratum
    with the smallest (md5(text), doc_id) — reproducible on any engine
    (the ROW_NUMBER-over-hash shape every training-data split uses).
    Stratum cardinality grows with label space, so the per-stratum
    top-k runs through ``grouped_apply``."""
    import hashlib

    from .common import grouped_apply, table_rows

    def hash_rows(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(x.encode()).hexdigest()
              for x in t["text"].to_pylist()]
        t = pa.table({"lang": t["lang"], "doc_id": t["doc_id"],
                      "h": pa.array(hs, pa.string())})
        # per-batch PARTIAL top-k per stratum: the global top-k per lang
        # is a subset of every batch's local top-k, so the stratum
        # shuffle carries only blocks × langs × k rows, not the corpus
        idx = pc.sort_indices(t, sort_keys=[("lang", "ascending"),
                                            ("h", "ascending"),
                                            ("doc_id", "ascending")])
        t = t.take(idx)
        lang = t["lang"].combine_chunks()
        n = len(t)
        if n == 0:
            return t
        change = np.concatenate((
            [True], np.asarray(pc.not_equal(lang.slice(1),
                                            lang.slice(0, n - 1)),
                               dtype=bool)))
        group_start = np.maximum.accumulate(
            np.where(change, np.arange(n), 0))
        rank = np.arange(n) - group_start
        return t.filter(pa.array(rank < k))

    def topk(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("h", "ascending"),
                                            ("doc_id", "ascending")])
        top = g.take(idx.slice(0, min(k, len(g))))
        return top.select(["lang", "doc_id"])

    empty = pa.table({"lang": pa.array([], pa.string()),
                      "doc_id": pa.array([], pa.int64())})
    ds = read(sf_dir, "documents", ["doc_id", "lang", "text"]).map_batches(
        hash_rows, batch_format="pyarrow")
    out = grouped_apply(ds, "lang", topk, empty,
                        size_hint=table_rows(sf_dir, "documents")).to_pandas()
    return finish(out, ["lang", "doc_id"])


def top_tokens_heavy_hitters(sf_dir: str, k: int = 20,
                             counters: int = 2000) -> pd.DataFrame:
    """EXACT global top-k tokens via two passes — the 100 TB-safe heavy
    hitters pattern: (1) per-batch Misra–Gries summaries (``counters``
    counters each) merge on the driver into a candidate set that
    provably contains every token with frequency > N/counters (ample
    headroom over the Zipf top-k on any text corpus); (2) one scan
    counts ONLY the broadcast candidates exactly, and the bounded-key
    groupby + top-k finishes. Unlike ``top_tokens``'s full-vocabulary
    ``grouped_aggregate``, nothing vocabulary-sized is ever shuffled."""
    import ray
    from ray.data.aggregate import Sum

    def mg_summary(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        flat = pc.list_flatten(pc.split_pattern_regex(low, r"\W+"))
        flat = flat.filter(pc.not_equal(flat, ""))
        counts = pa.table({"token": flat}).group_by("token").aggregate(
            [([], "count_all")])
        w = counts.column("count_all").to_numpy(zero_copy_only=False)
        if len(counts) > counters:
            # vectorized Misra–Gries compression of the batch's exact
            # counts (replaces the per-token dict loop — ~2M Python
            # iterations per sf0.1 scan): subtract the (counters+1)-th
            # largest count d and keep strictly positive weights. Since
            # the counters+1 largest counts are each >= d and sum to
            # <= N_B, d <= N_B/(counters+1); at most `counters` counts
            # exceed d, and every token undercounts by <= d — the same
            # summary validity (and a tighter bound) as the sequential
            # decrement-all algorithm.
            d = np.partition(w, -(counters + 1))[-(counters + 1)]
            keep = w > d
            counts = counts.filter(pa.array(keep))
            w = w[keep] - d
        return pa.table({"token": counts.column("token"),
                         "weight": pa.array(w, pa.int64())})

    from .common import grouped_aggregate

    # merge the per-batch summaries DISTRIBUTED: the summary rows are
    # batches × counters (not corpus-sized, but corpus-GROWING), so the
    # weight sum runs through grouped_aggregate and only per-block
    # top-`counters` partials reach the driver
    summaries = read(sf_dir, "documents", ["text"]).map_batches(
        mg_summary, batch_format="pyarrow")
    merged = grouped_aggregate(summaries, "token", [("weight", "sum")])

    def block_top(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("weight_sum", "descending"),
                                            ("token", "ascending")])
        return t.take(idx.slice(0, min(counters, len(t))))

    tops = merged.map_batches(
        block_top, batch_format="pyarrow", batch_size=None).to_pandas()
    cand = pa.array(
        tops.sort_values(["weight_sum", "token"], ascending=[False, True],
                         kind="mergesort").head(counters)["token"].tolist(),
        pa.string())
    cand_ref = ray.put(cand)

    def exact_counts(t: pa.Table) -> pa.Table:
        from .common import bcast_get

        cand = bcast_get(cand_ref)
        low = pc.utf8_lower(t["text"])
        flat = pc.list_flatten(pc.split_pattern_regex(low, r"\W+"))
        flat = flat.filter(pc.not_equal(flat, ""))
        flat = flat.filter(pc.is_in(flat, value_set=cand))
        return pa.table({"token": flat}).group_by("token").aggregate(
            [([], "count_all")])

    out = (
        read(sf_dir, "documents", ["text"])
        .map_batches(exact_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    out = _ensure_cols(out, {"token": "str", "n": "int64"})
    out = out.sort_values(["n", "token"], ascending=[False, True],
                          kind="mergesort").head(k)
    return out.reset_index(drop=True)


def _word_ngrams(t: pa.Table, n: int):
    """Vectorized word n-grams: (row_index, gram_string) flat arrays.

    Tokens flatten once per batch; gram strings are built by n-1
    elementwise object-array concatenations over shifted views (no
    per-row Python loop). Windows that straddle two documents are
    masked out via ``list_parent_indices`` equality.
    """
    low = pc.utf8_lower(t["text"])
    lists = pc.split_pattern_regex(low, r"\W+")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists)
    mask = pc.not_equal(flat, "")
    flat = flat.filter(mask)
    parent = parent.filter(mask)
    toks = np.asarray(flat.to_pylist(), dtype=object)
    par = np.asarray(parent)
    if len(toks) < n:
        return np.empty(0, np.int64), np.empty(0, object)
    m = len(toks) - n + 1
    valid = par[:m] == par[n - 1:]
    g = toks[:m].copy()
    for k in range(1, n):
        g = g + " "
        g = g + toks[k:m + k]
    return par[:m][valid].astype(np.int64), g[valid]


def train_val_test_split(sf_dir: str) -> pd.DataFrame:
    """Deterministic 3-way train/val/test partition by content hash —
    the reproducible-split primitive every training run needs: the
    first hex digit of md5(text) routes 12/16 to train, 2/16 to val,
    2/16 to test, so any engine (and any rerun at any scale) assigns
    every document identically with NO shuffle, no RNG state, and no
    coordination — a pure map over the stream."""

    def assign(t: pa.Table) -> pa.Table:
        # explicit U1 dtype: an empty list would otherwise make a
        # float64 array whose string comparison below raises
        first = np.array(
            [hashlib.md5(x.encode()).hexdigest()[0]
             for x in t["text"].to_pylist()], dtype="U1")
        split = np.where(
            first <= "b", "train",
            np.where((first == "c") | (first == "d"), "val", "test"))
        return pa.table({
            "doc_id": t["doc_id"],
            "lang": t["lang"],
            "split": pa.array(split, pa.string()),
        })

    out = (
        read(sf_dir, "documents", ["doc_id", "lang", "text"])
        .map_batches(assign, batch_format="pyarrow")
        .to_pandas()
    )
    return finish(out, ["doc_id"])


def _doc_tokens(t: pa.Table):
    """Flat lowercase \\w+ tokens + row indices for a batch: one
    vectorized split, empties masked out."""
    low = pc.utf8_lower(t["text"])
    lists = pc.split_pattern_regex(low, r"\W+")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists)
    mask = pc.not_equal(flat, "")
    return flat.filter(mask), parent.filter(mask)


def boilerplate_segments(sf_dir: str, seg: int = 3,
                         min_docs: int = 3) -> pd.DataFrame:
    """Cross-corpus boilerplate detection (the RefinedWeb/CCNet-style
    repeated-span gate): chop each doc into NON-OVERLAPPING ``seg``-token
    segments, count each segment's corpus-wide document frequency, and
    report per doc how many of its segments are boilerplate (appear in
    >= ``min_docs`` distinct docs). Returns (doc_id, n_segments,
    n_boiler).

    Scale shape: segments shuffle as 16-byte blake2b keys (never the
    text); document frequency is a ``grouped_aggregate`` over per-batch
    (doc, key)-deduped rows (a doc never splits across batches, so
    batch-local dedup is global); the boilerplate key set is
    corpus-growing, so the membership test is a ``shuffle_join`` semi —
    NOT a broadcast; per-doc totals are map-side."""
    from .common import grouped_aggregate
    from .join import shuffle_join

    def seg_rows(t: pa.Table) -> pa.Table:
        flat, parent = _doc_tokens(t)
        toks = np.asarray(flat.to_pylist(), dtype=object)
        par = np.asarray(parent)
        counts = np.bincount(par, minlength=len(t))
        nseg = counts // seg
        m = int(nseg.sum())
        if m == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "k": pa.array([], pa.binary())})
        starts = np.cumsum(counts) - counts        # first token per doc
        cum = np.cumsum(nseg) - nseg               # first chunk per doc
        within = np.arange(m) - np.repeat(cum, nseg)
        tok0 = np.repeat(starts, nseg) + within * seg
        g = toks[tok0].copy()
        for j in range(1, seg):
            g = g + " "
            g = g + toks[tok0 + j]
        keys = [hashlib.blake2b(s.encode(), digest_size=16).digest()
                for s in g]
        doc = t["doc_id"].take(pa.array(np.repeat(
            np.arange(len(t), dtype=np.int64), nseg)))
        return pa.table({"doc_id": doc, "k": pa.array(keys, pa.binary())})

    def totals(t: pa.Table) -> pa.Table:
        _, parent = _doc_tokens(t)
        counts = np.bincount(np.asarray(parent), minlength=len(t))
        return pa.table({
            "doc_id": t["doc_id"],
            "n_segments": pa.array(counts // seg, pa.int64()),
        })

    docs = read(sf_dir, "documents", ["doc_id", "text"])
    segs = docs.map_batches(seg_rows, batch_format="pyarrow")

    # document frequency over batch-deduped (doc, key) pairs
    def dedup_pairs(t: pa.Table) -> pa.Table:
        return t.group_by(["doc_id", "k"], use_threads=False).aggregate([])

    dfreq = grouped_aggregate(
        segs.map_batches(dedup_pairs, batch_format="pyarrow"),
        "k", [("doc_id", "count")])
    boiler = dfreq.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t["doc_id_count"], min_docs)).select(["k"]),
        batch_format="pyarrow")

    hits = shuffle_join(
        segs, boiler, "k", ["doc_id"], [], how="semi",
        left_types={"doc_id": pa.int64()}, right_types={})
    nb = grouped_aggregate(hits, "doc_id", [("k", "count")])

    out = shuffle_join(
        docs.map_batches(totals, batch_format="pyarrow"),
        nb.map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"],
                                "n_boiler": t["k_count"]}),
            batch_format="pyarrow"),
        "doc_id", ["n_segments"], ["n_boiler"], how="left",
        left_types={"n_segments": pa.int64()},
        right_types={"n_boiler": pa.int64()},
    ).to_pandas()
    out = _ensure_cols(out, {"doc_id": "int64", "n_segments": "int64",
                             "n_boiler": "int64"})
    out["n_boiler"] = out["n_boiler"].fillna(0).astype("int64")
    return finish(out.astype({"doc_id": "int64", "n_segments": "int64"}),
                  ["doc_id"])


def tfidf_top_terms(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Per-document top-``k`` terms by TF-IDF — the feature-extraction
    staple. Returns (doc_id, tok, tf, df, tfidf, rnk) with rnk 1..k
    ordered by the INTEGER-exact key (tf desc, df asc, tok asc);
    tfidf = round(tf * ln(N/df), 4) rides along as the score.

    Scale shape: term frequencies are map-side (a doc never splits
    across batches → one C++ group_by per batch); document frequency is
    one ``grouped_aggregate`` over the (doc, token)-distinct tf rows;
    the vocabulary is corpus-growing, so tf⋈df is a ``shuffle_join`` on
    the token — not a broadcast; the per-doc top-k regroups once via
    ``grouped_apply``."""
    from .common import grouped_aggregate, grouped_apply
    from .join import shuffle_join

    n_docs = read(sf_dir, "documents", ["doc_id"]).count()

    def tf_rows(t: pa.Table) -> pa.Table:
        flat, parent = _doc_tokens(t)
        tt = pa.table({"doc_id": t["doc_id"].take(parent), "tok": flat})
        g = tt.group_by(["doc_id", "tok"],
                        use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(["doc_id", "tok", "tf"])

    tf_ds = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tf_rows, batch_format="pyarrow")
    # tf rows are (doc, token)-distinct by construction, so counting
    # rows per token IS the document frequency
    df_ds = grouped_aggregate(
        tf_ds.map_batches(lambda t: t.select(["tok"]),
                          batch_format="pyarrow"),
        "tok", [("tok", "count")],
    ).map_batches(
        lambda t: pa.table({"tok": t["tok"], "df": t["tok_count"]}),
        batch_format="pyarrow")

    joined = shuffle_join(
        tf_ds, df_ds, "tok", ["doc_id", "tf"], ["df"], how="inner",
        left_types={"doc_id": pa.int64(), "tf": pa.int64()},
        right_types={"df": pa.int64()})

    def topk(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("tf", "descending"),
                                            ("df", "ascending"),
                                            ("tok", "ascending")])
        top = g.take(idx.slice(0, min(k, len(g))))
        tfv = top["tf"].to_numpy()
        dfv = top["df"].to_numpy()
        return pa.table({
            "doc_id": top["doc_id"],
            "tok": top["tok"],
            "tf": tfv,
            "df": dfv,
            "tfidf": pa.array(r4(tfv * np.log(n_docs / dfv)), pa.float64()),
            "rnk": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
        })

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "tok": pa.array([], pa.string()),
                      "tf": pa.array([], pa.int64()),
                      "df": pa.array([], pa.int64()),
                      "tfidf": pa.array([], pa.float64()),
                      "rnk": pa.array([], pa.int64())})
    out = grouped_apply(joined, "doc_id", topk, empty).to_pandas()
    return finish(out, ["doc_id", "rnk"])


def winnowing_fingerprints(sf_dir: str, k: int = 3, w: int = 4) -> pd.DataFrame:
    """Document fingerprinting by WINNOWING (Schleimer/Wilkerson/Aiken,
    the MOSS algorithm): hash every overlapping ``k``-token gram, slide
    a window of ``w`` consecutive gram hashes, keep each window's
    minimum — guaranteeing any shared run of ``w+k-1`` tokens between
    two documents shares a fingerprint, at ~2/(w+1) the storage of the
    full gram set. Returns distinct (doc_id, fp) rows.

    Pure map — no shuffle: grams ride ``_word_ngrams``'s vectorized
    flat arrays, the window minimum is ``w-1`` elementwise
    ``np.minimum`` passes over shifted views (doc boundaries masked via
    parent-index equality), and per-batch dedup is global dedup because
    a document never splits across batches."""
    out = _winnow_dataset(sf_dir, k, w).to_pandas()
    return finish(out, ["doc_id", "fp"])


def _winnow_dataset(sf_dir: str, k: int, w: int):
    """Distinct (doc_id, fp) winnowing rows as a streaming Dataset (the
    shared front half of ``winnowing_fingerprints`` and
    ``winnowing_neardup_pairs``)."""

    def fps(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "fp": pa.array([], pa.string())})
        par, grams = _word_ngrams(t, k)
        if len(grams) < w:
            return empty
        # object dtype: np.minimum has no unicode loop but falls back to
        # python richcompare for objects — still one pass per shift
        hs = np.asarray(
            [hashlib.md5(g.encode()).hexdigest() for g in grams],
            dtype=object)
        m = len(hs) - w + 1
        wmin = hs[:m].copy()
        for j in range(1, w):
            np.minimum(wmin, hs[j:m + j], out=wmin)
        valid = par[:m] == par[w - 1:]
        sel = pa.table({
            "doc_id": t["doc_id"].take(pa.array(par[:m][valid])),
            "fp": pa.array(wmin[valid], pa.string()),
        })
        return sel.group_by(["doc_id", "fp"], use_threads=False).aggregate([])

    return (
        read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(fps, batch_format="pyarrow")
    )


def winnowing_neardup_pairs(sf_dir: str, k: int = 3, w: int = 4,
                            max_df: int = 16,
                            min_shared: int = 2) -> pd.DataFrame:
    """Substring-overlap near-duplicate pairs via shared winnowing
    fingerprints (the MOSS match step): document pairs sharing at least
    ``min_shared`` fingerprints, i.e. at least that many distinct
    ``w+k-1``-token runs in common. Fingerprints held by more than
    ``max_df`` documents are boilerplate and skipped (same guard as the
    LSH bucket caps — and at 100 TB the skew guard, since a hot
    fingerprint would otherwise emit O(df²) pairs).

    Fully distributed: one ``grouped_apply`` shuffle on fp emits
    in-bucket pairs (bucket size bounded by ``max_df``), then a
    ``grouped_aggregate`` counts shared fps per pair. Nothing
    corpus-sized touches the driver."""
    from .common import grouped_aggregate, grouped_apply

    fps = _winnow_dataset(sf_dir, k, w)
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})

    def emit_pairs(g: pa.Table) -> pa.Table:
        if len(g) > max_df:  # boilerplate fingerprint
            return empty
        ids = np.sort(g["doc_id"].to_numpy())
        ai, bi = np.triu_indices(len(ids), 1)
        return pa.table({"a": pa.array(ids[ai], pa.int64()),
                         "b": pa.array(ids[bi], pa.int64())})

    pairs = grouped_apply(fps, "fp", emit_pairs, empty, min_group_size=2)
    cnt = grouped_aggregate(pairs, ["a", "b"], [("a", "count")])
    out = cnt.to_pandas().rename(columns={"a_count": "n_shared"})
    out = out[out["n_shared"] >= min_shared]
    out["n_shared"] = out["n_shared"].astype("int64")
    return finish(out, ["a", "b"])


# fixed "model" weights: (bias, w_tokens, w_chars, w_stop_ratio) — stands
# in for a trained quality classifier checkpoint
_MODEL_W = (-2.0, 0.01, 0.002, 3.0)


class _ModelScorer:
    """Actor-pool model-inference stage: the BATCHED INFERENCE pattern —
    the 'model' (here a logistic scorer over the quality features; in
    production a real checkpoint) is loaded ONCE per actor in
    ``__init__`` from a broadcast ref, and ``__call__`` scores a whole
    Arrow batch vectorized."""

    def __init__(self, weights_ref):
        from .common import bcast_get

        self.w = np.asarray(bcast_get(weights_ref), dtype=np.float64)
        self.stop_pat = r"\b(" + "|".join(STOPWORDS) + r")\b"

    def __call__(self, t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        lt = pa.table({"low": low})
        n_tokens = _count_re(lt, "low", TOKEN_RE).to_numpy(
            zero_copy_only=False).astype(np.float64)
        n_stop = _count_re(lt, "low", self.stop_pat).to_numpy(
            zero_copy_only=False).astype(np.float64)
        n_chars = pc.utf8_length(t["text"]).to_numpy(
            zero_copy_only=False).astype(np.float64)
        ratio = n_stop / np.maximum(1.0, n_tokens)
        z = (self.w[0] + self.w[1] * n_tokens + self.w[2] * n_chars
             + self.w[3] * ratio)
        score = r4(1.0 / (1.0 + np.exp(-z)))
        return pa.table({
            "doc_id": t["doc_id"],
            "score": pa.array(score, pa.float64()),
            "keep": pa.array(score >= 0.5),
        })


def score_documents_model(sf_dir: str) -> pd.DataFrame:
    """Model-based quality scoring of every document — the batched-
    inference stage every modern curation pipeline runs (fasttext/
    classifier gating). Stateful actor pool: weights ship once via
    ``ray.put`` and deserialize once per actor (``_ModelScorer``);
    scoring is one vectorized pass per batch. Deterministic logistic
    scorer => exact DuckDB oracle."""
    import ray

    wref = ray.put(_MODEL_W)
    out = (
        read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(_ModelScorer, fn_constructor_args=(wref,),
                     concurrency=2, batch_format="pyarrow")
        .to_pandas()
    )
    return finish(out, ["doc_id"])


def contamination_check(sf_dir: str, n: int = 4,
                        holdout_mod: int = 10) -> pd.DataFrame:
    """Train/test contamination detection — the pre-training hygiene
    gate: which TRAIN documents share any word ``n``-gram with the
    held-out evaluation set (``doc_id % holdout_mod == 0``)?

    Scale shape (the standard production decomposition): the holdout
    set is small BY CONSTRUCTION (an eval set), so its distinct-gram
    set is collected once (per-batch unique pre-trim → driver unique)
    and broadcast via ``ray.put``; the train corpus then streams
    through one vectorized map_batches membership scan
    (``pc.is_in`` against the broadcast value_set) — no shuffle, no
    train-side materialization. Per-batch doc_id uniqueness is global
    uniqueness because a document's grams never split across batches.
    """
    import ray

    from .common import bcast_get

    docs = read(sf_dir, "documents", ["doc_id", "text"])

    def hold_partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        sub = t.filter(pa.array(ids % holdout_mod == 0))
        if len(sub) == 0:
            return pa.table({"g": pa.array([], pa.string())})
        _, grams = _word_ngrams(sub, n)
        return pa.table({"g": pa.array(np.unique(grams), pa.string())})

    hold = docs.map_batches(hold_partial, batch_format="pyarrow").to_pandas()
    gset = pa.array(pd.unique(hold["g"]), pa.string())
    gref = ray.put(gset)

    def scan(t: pa.Table) -> pa.Table:
        vs = bcast_get(gref)
        ids = t["doc_id"].to_numpy()
        sub = t.filter(pa.array(ids % holdout_mod != 0))
        empty = pa.table({"doc_id": pa.array([], pa.int64())})
        if len(sub) == 0:
            return empty
        didx, grams = _word_ngrams(sub, n)
        if len(grams) == 0:
            return empty
        hit = pc.is_in(pa.array(grams, pa.string()), value_set=vs)
        hitm = hit.to_numpy(zero_copy_only=False)
        cids = np.unique(sub["doc_id"].to_numpy()[didx[hitm]])
        return pa.table({"doc_id": pa.array(cids, pa.int64())})

    out = docs.map_batches(scan, batch_format="pyarrow").to_pandas()
    return finish(out.astype({"doc_id": "int64"}), ["doc_id"])


# Bloom decontamination parameters: a 2^22-bit filter is a FIXED 512 KiB
# broadcast regardless of holdout size — the scale path when the eval
# set's distinct-gram set is too large to broadcast exactly (the exact
# value_set in contamination_check grows with the holdout; the filter
# does not). k=4 double-hashed probes → FP rate (1-e^(-kn/m))^k,
# ~1e-4 at n=1e5 grams and still <1% at n=5e5.
BLOOM_BITS = 1 << 22
BLOOM_K = 4


def _bloom_positions(grams: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, len(grams)) bit positions via double hashing — two
    independent 64-bit string hashes h1, h2 (h2 forced odd so the probe
    stride never degenerates), probe i at (h1 + i*h2) mod m_bits.
    ``pd.util.hash_array`` is deterministic across processes (fixed
    16-byte keys, no PYTHONHASHSEED), so workers and driver agree."""
    h1 = pd.util.hash_array(grams, hash_key="doonopbloomhash1")
    h2 = pd.util.hash_array(grams, hash_key="doonopbloomhash2") | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)


def contamination_check_bloom(sf_dir: str, n: int = 4,
                              holdout_mod: int = 10,
                              m_bits: int = BLOOM_BITS,
                              k: int = BLOOM_K) -> pd.DataFrame:
    """Train/test contamination via a Bloom filter — the scale twin of
    ``contamination_check`` for holdout sets whose distinct-gram set is
    too large to broadcast exactly: workers emit per-batch UNIQUE bit
    positions (≤ k × batch distinct grams, not gram strings), the driver
    ORs them into one fixed-size bitmap (512 KiB at the default —
    constant in both corpus and holdout size), and the train corpus
    streams through one vectorized membership scan against the broadcast
    bitmap. Bloom guarantees NO FALSE NEGATIVES: the flagged set is a
    superset of the exact gate's (``contamination_bloom_violations``
    recomputes that invariant; tests pin the FP count)."""
    import ray

    from .common import bcast_get

    docs = read(sf_dir, "documents", ["doc_id", "text"])

    def hold_bits(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        sub = t.filter(pa.array(ids % holdout_mod == 0))
        empty = pa.table({"p": pa.array([], pa.uint64())})
        if len(sub) == 0:
            return empty
        _, grams = _word_ngrams(sub, n)
        if len(grams) == 0:
            return empty
        pos = _bloom_positions(np.unique(grams), m_bits, k)
        return pa.table({"p": pa.array(np.unique(pos), pa.uint64())})

    hold = docs.map_batches(hold_bits, batch_format="pyarrow").to_pandas()
    # driver merge is O(k × holdout distinct grams) positions — eval-set
    # sized by construction, same budget as the exact gate's unique()
    pos = np.unique(hold["p"].to_numpy().astype(np.uint64))
    bitmap = np.zeros(m_bits >> 3, dtype=np.uint8)
    np.bitwise_or.at(bitmap, (pos >> 3).astype(np.int64),
                     (np.uint8(1) << (pos & 7).astype(np.uint8)))
    bref = ray.put(bitmap)

    def scan(t: pa.Table) -> pa.Table:
        bm = bcast_get(bref)
        ids = t["doc_id"].to_numpy()
        sub = t.filter(pa.array(ids % holdout_mod != 0))
        empty = pa.table({"doc_id": pa.array([], pa.int64())})
        if len(sub) == 0:
            return empty
        didx, grams = _word_ngrams(sub, n)
        if len(grams) == 0:
            return empty
        ug, inv = np.unique(grams, return_inverse=True)
        p = _bloom_positions(ug, m_bits, k)
        bits = (bm[(p >> np.uint64(3)).astype(np.int64)]
                >> (p & np.uint64(7)).astype(np.uint8)) & 1
        hitm = bits.all(axis=0)[inv]
        cids = np.unique(sub["doc_id"].to_numpy()[didx[hitm]])
        return pa.table({"doc_id": pa.array(cids, pa.int64())})

    out = docs.map_batches(scan, batch_format="pyarrow").to_pandas()
    return finish(out.astype({"doc_id": "int64"}), ["doc_id"])


# PII patterns, applied IN ORDER (counts are taken before each replace,
# so the oracle must mirror the same sequential semantics). Both sides
# run RE2 (pyarrow re2 kernels / DuckDB regexp_*), so the patterns stay
# within the common RE2 subset. The synthetic corpus carries src\d+
# tokens (real hits at every scale); email/phone/IPv4 semantics are
# pinned against crafted inputs in tests/test_text_extra.py.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\+?\d[\d -]{7,}\d"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("srcid", r"\bsrc\d+\b"),
)


def pii_redact(sf_dir: str) -> pd.DataFrame:
    """PII redaction over ``source || ': ' || text`` — the pre-training
    scrub gate: every match of each pattern is replaced with ``[PII]``
    and counted. Pure vectorized map (pyarrow RE2 kernels), no shuffle;
    the replacement token contains no digits/@, so later patterns can't
    match inside earlier redactions."""

    def redact(t: pa.Table) -> pa.Table:
        txt = pc.binary_join_element_wise(t["source"], t["text"], ": ")
        total = pa.array(np.zeros(len(t), np.int64))
        for _, pat in PII_PATTERNS:
            total = pc.add(total, pc.cast(
                pc.count_substring_regex(txt, pat), pa.int64()))
            txt = pc.replace_substring_regex(txt, pat, "[PII]")
        return pa.table({
            "doc_id": t["doc_id"],
            "clean_text": txt,
            "n_redacted": total,
        })

    out = (
        read(sf_dir, "documents", ["doc_id", "source", "text"])
        .map_batches(redact, batch_format="pyarrow")
        .to_pandas()
    )
    return finish(out, ["doc_id"])


def repetition_scores(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition quality signals per document: bigram
    count, the top bigram's share, and the duplicate-bigram fraction
    (1 - distinct/total). High values flag boilerplate/spam for the
    curation gate. Pure map — a document's bigrams never straddle
    batches, so per-batch stats are exact; the in-batch reduction is a
    single C-level factorize+bincount pass, no shuffle."""

    def rep(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_bigrams": pa.array([], pa.int64()),
            "max_bigram_n": pa.array([], pa.int64()),
            "top_bigram_frac": pa.array([], pa.float64()),
            "dup_bigram_frac": pa.array([], pa.float64()),
        })
        par, grams = _word_ngrams(t, 2)
        if len(grams) == 0:
            return empty
        # count per (doc,gram): factorize grams, combine with doc index
        codes, _ = pd.factorize(grams, sort=False)
        keys = par.astype(np.int64) * (codes.max() + 1) + codes
        ukeys, cnt = np.unique(keys, return_counts=True)
        udoc = (ukeys // (codes.max() + 1)).astype(np.int64)
        # per-doc aggregates over the (doc,gram) counts (udoc is sorted)
        docs, starts = np.unique(udoc, return_index=True)
        n_big = np.add.reduceat(cnt, starts)
        mx = np.maximum.reduceat(cnt, starts)
        distinct = np.diff(np.append(starts, len(cnt)))
        return pa.table({
            "doc_id": t["doc_id"].take(pa.array(docs)),
            "n_bigrams": pa.array(n_big, pa.int64()),
            "max_bigram_n": pa.array(mx.astype(np.int64), pa.int64()),
            "top_bigram_frac": pa.array(r4(mx / n_big), pa.float64()),
            "dup_bigram_frac": pa.array(
                r4((n_big - distinct) / n_big), pa.float64()),
        })

    out = (
        read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(rep, batch_format="pyarrow")
        .to_pandas()
    )
    return finish(out, ["doc_id"])


BM25_QUERY = ("merge", "window", "scan")
BM25_K1, BM25_B = 1.2, 0.75


def keyword_search_bm25(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """BM25 top-k document search for a fixed query — the retrieval
    baseline next to the ANN suite. Two streaming passes, both pure
    maps with tiny driver merges:

    pass 1: per-batch partials of (n_docs, n_tokens, df per term)
            -> one small driver sum (corpus stats are O(|query|));
    pass 2: per-batch vectorized tf via token-equality bincount, BM25
            score, per-BLOCK top-k partial -> driver merges blocks*k
            rows. Nothing corpus-sized leaves the workers."""
    terms = list(BM25_QUERY)

    def stats_partial(t: pa.Table) -> pa.Table:
        flat, parent = _doc_tokens(t)
        toks = np.asarray(flat, dtype=object)
        par = np.asarray(parent)
        row = {"n_docs": [np.int64(len(t))], "n_tokens": [np.int64(len(toks))]}
        for term in terms:
            hit = toks == term
            row[f"df_{term}"] = [np.int64(len(np.unique(par[hit])))]
        return pa.table(row)

    docs = read(sf_dir, "documents", ["doc_id", "text"])
    st = docs.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    n_docs = int(st["n_docs"].sum()) if len(st.columns) else 0
    if n_docs == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    avgdl = float(st["n_tokens"].sum()) / n_docs
    idf = {t_: float(np.log(1.0 + (n_docs - int(st[f"df_{t_}"].sum()) + 0.5)
                            / (int(st[f"df_{t_}"].sum()) + 0.5)))
           for t_ in terms}

    def score_block(t: pa.Table) -> pa.Table:
        flat, parent = _doc_tokens(t)
        toks = np.asarray(flat, dtype=object)
        par = np.asarray(parent)
        dl = np.bincount(par, minlength=len(t)).astype(np.float64)
        denom_dl = BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
        score = np.zeros(len(t), np.float64)
        for term in terms:
            tf = np.bincount(par[toks == term],
                             minlength=len(t)).astype(np.float64)
            score += idf[term] * tf * (BM25_K1 + 1.0) / (tf + denom_dl)
        keep = score > 0.0
        sub = pa.table({
            "doc_id": t["doc_id"].filter(pa.array(keep)),
            "score": pa.array(score[keep], pa.float64()),
        })
        # per-block partial top-k (ties by doc_id ascending)
        d = sub.to_pandas().sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort")
        return pa.Table.from_pandas(d.head(k), preserve_index=False)

    parts = docs.map_batches(score_block, batch_format="pyarrow").to_pandas()
    top = parts.sort_values(["score", "doc_id"], ascending=[False, True],
                            kind="mergesort").head(k).reset_index(drop=True)
    top["score"] = r4(top["score"])
    return top


def pack_sequences(sf_dir: str, seq_len: int = 512, bucket_size: int = 256,
                   out_root: str | None = None) -> pd.DataFrame:
    """Sequence packing — the step between curation and the trainer:
    concatenate tokenized documents and slice the stream into
    fixed-``seq_len`` training sequences (list<int32> token ids),
    materialized as parquet shards.

    Determinism at any parallelism: docs pack inside
    ``(lang, doc_id // bucket_size)`` buckets, token streams
    concatenated in doc_id order — bucket boundaries derive from the
    KEY, not from block layout, so the packed output is byte-identical
    whatever the cluster shape, and a bucket (≤``bucket_size`` docs)
    always fits worker memory. Each bucket's tail (< seq_len tokens)
    stays a short final sequence; buckets never blend, so a re-run of
    one failed bucket reproduces exactly its shard rows (resumable).

    Pipeline: map_batches tokenizes (``\\W+`` split, same RE2 pattern
    as the DuckDB oracle) and hashes tokens to int32 ids via a
    dictionary-encode-then-hash (only UNIQUE tokens per batch pay the
    hash); ``grouped_apply`` runs the per-bucket packer (one sort
    all-to-all on the short (lang, bucket) key — token lists ride it
    once); sequences are written to parquet and the returned per-lang
    stats are computed from the MATERIALIZED output (so the oracle
    checks what a trainer would actually read)."""
    import os
    import shutil
    import zlib

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from .common import grouped_apply

    out_root = out_root or f"/tmp/doonop_out/pack_{os.getpid()}"
    shutil.rmtree(out_root, ignore_errors=True)
    os.makedirs(out_root, exist_ok=True)

    def tokenize(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        lists = pc.split_pattern_regex(low, r"\W+")
        flat = pc.list_flatten(lists).combine_chunks()
        # id per token: crc32 of the utf8 bytes, hashed once per UNIQUE
        # token (dictionary encoding) — the hot loop is dict-sized
        dic = flat.dictionary_encode()
        uniq = dic.dictionary.to_pylist()
        ids = np.fromiter((zlib.crc32(u.encode()) & 0x7FFFFFFF
                           for u in uniq),
                          dtype=np.int32, count=len(uniq))
        tok_ids = ids[dic.indices.to_numpy(zero_copy_only=False)] \
            if len(flat) else np.array([], dtype=np.int32)
        # re-list the flat ids with the original offsets, dropping the
        # empty-string artifacts of \W+ splitting
        keep = np.array([len(u) > 0 for u in uniq], dtype=bool)
        tok_keep = keep[dic.indices.to_numpy(zero_copy_only=False)] \
            if len(flat) else np.array([], dtype=bool)
        offsets = lists.combine_chunks().offsets.to_numpy(
            zero_copy_only=False).astype(np.int64)
        # per-row kept-token count = prefix-sum sampled at row offsets
        # (exact for zero-length rows, unlike reduceat index games)
        csum = np.concatenate(([0], np.cumsum(tok_keep, dtype=np.int64)))
        kept_per_row = csum[offsets[1:]] - csum[offsets[:-1]]
        new_offsets = np.concatenate(([0], np.cumsum(kept_per_row)))
        id_list = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()),
            pa.array(tok_ids[tok_keep], pa.int32()))
        return pa.table({
            "lang": t["lang"],
            "bucket": pc.cast(
                pc.floor(pc.divide(pc.cast(t["doc_id"], pa.float64()),
                                   float(bucket_size))), pa.int64()),
            "doc_id": t["doc_id"],
            "ids": id_list,
            "n": pa.array(kept_per_row, pa.int64()),
        })

    ds = read(sf_dir, "documents", ["doc_id", "lang", "text"]).map_batches(
        tokenize, batch_format="pyarrow")

    empty = pa.table({
        "lang": pa.array([], pa.string()),
        "bucket": pa.array([], pa.int64()),
        "seq_idx": pa.array([], pa.int64()),
        "tokens": pa.array([], pa.list_(pa.int32())),
        "n_tokens": pa.array([], pa.int64()),
    })

    def pack_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by("doc_id")
        stream = pc.list_flatten(g["ids"]).to_numpy(zero_copy_only=False)
        total = len(stream)
        if total == 0:
            return empty
        n_seq = -(-total // seq_len)
        offsets = np.minimum(np.arange(n_seq + 1) * seq_len, total)
        toks = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(stream.astype(np.int32), pa.int32()))
        return pa.table({
            "lang": pa.array([g["lang"][0].as_py()] * n_seq, pa.string()),
            "bucket": pa.array([g["bucket"][0].as_py()] * n_seq, pa.int64()),
            "seq_idx": pa.array(np.arange(n_seq), pa.int64()),
            "tokens": toks,
            "n_tokens": pa.array(np.diff(offsets).astype(np.int64),
                                 pa.int64()),
        })

    packed = grouped_apply(ds, ["lang", "bucket"], pack_bucket, empty)
    packed.write_parquet(out_root)

    import os

    import pyarrow.parquet as pq_

    shard_files = ([f for f in os.listdir(out_root) if f.endswith(".parquet")]
                   if os.path.isdir(out_root) else [])
    if not any("lang" in pq_.read_schema(os.path.join(out_root, f)).names
               for f in shard_files):
        # empty corpus: the write emits either nothing or a schema-less
        # empty file — no shards to aggregate
        return pd.DataFrame({"lang": pd.Series([], dtype="str"),
                             "n_sequences": pd.Series([], dtype="int64"),
                             "total_tokens": pd.Series([], dtype="int64")})

    out = (rd.read_parquet(out_root, columns=["lang", "n_tokens"])
           .groupby("lang")
           .aggregate(Count(alias_name="n_sequences"),
                      Sum("n_tokens", alias_name="total_tokens"))
           .to_pandas())
    if not len(out.columns):
        out = pd.DataFrame({"lang": pd.Series([], dtype="str"),
                            "n_sequences": pd.Series([], dtype="int64"),
                            "total_tokens": pd.Series([], dtype="int64")})
    out["n_sequences"] = out["n_sequences"].astype("int64")
    out["total_tokens"] = out["total_tokens"].astype("int64")
    return finish(out, ["lang"])[["lang", "n_sequences", "total_tokens"]]


LM_BUCKETS_UNI = 1 << 16
LM_BUCKETS_BI = 1 << 20
LM_ALPHA = 0.1


def _lm_hash(arr: np.ndarray, mod: int) -> np.ndarray:
    """Deterministic 64-bit multiplicative hash of int64 keys -> [0, mod)."""
    h = (arr.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    h ^= h >> np.uint64(29)
    return (h % np.uint64(mod)).astype(np.int64)


def _doc_token_hashes(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc token streams as crc32 ids: (flat ids, row offsets)."""
    import zlib

    low = pc.utf8_lower(t["text"])
    lists = pc.split_pattern_regex(low, r"\W+")
    flat = pc.list_flatten(lists).combine_chunks()
    dic = flat.dictionary_encode()
    uniq = dic.dictionary.to_pylist()
    ids = np.fromiter((zlib.crc32(u.encode()) for u in uniq),
                      dtype=np.int64, count=len(uniq))
    keep = np.array([len(u) > 0 for u in uniq], dtype=bool)
    idx = dic.indices.to_numpy(zero_copy_only=False) if len(flat) \
        else np.array([], dtype=np.int64)
    tok = ids[idx] if len(idx) else np.array([], dtype=np.int64)
    tok_keep = keep[idx] if len(idx) else np.array([], dtype=bool)
    offsets = lists.combine_chunks().offsets.to_numpy(
        zero_copy_only=False).astype(np.int64)
    csum = np.concatenate(([0], np.cumsum(tok_keep, dtype=np.int64)))
    new_offsets = csum[offsets]
    return tok[tok_keep], new_offsets


def _lm_count_partial(t: pa.Table) -> pa.Table:
    """Sparse hashed unigram+bigram count partial for one batch.
    Bigram buckets are offset by LM_BUCKETS_UNI so one (bucket, cnt)
    stream carries both tables."""
    tok, offs = _doc_token_hashes(t)
    if not len(tok):
        return pa.table({"bucket": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})
    uni = _lm_hash(tok, LM_BUCKETS_UNI)
    # bigrams never straddle documents: drop each row's first token
    first = np.zeros(len(tok), dtype=bool)
    first[offs[:-1][offs[:-1] < len(tok)]] = True
    prev = np.roll(tok, 1)
    big = _lm_hash(prev * np.int64(1000003) + tok, LM_BUCKETS_BI)[~first]
    counts = np.bincount(uni, minlength=LM_BUCKETS_UNI)
    bcounts = np.bincount(big, minlength=LM_BUCKETS_BI)
    nz_u, nz_b = np.flatnonzero(counts), np.flatnonzero(bcounts)
    return pa.table({
        "bucket": pa.array(np.concatenate(
            (nz_u, nz_b + LM_BUCKETS_UNI)), pa.int64()),
        "cnt": pa.array(np.concatenate(
            (counts[nz_u], bcounts[nz_b])), pa.int64()),
    })


def lm_perplexity_scores(sf_dir: str,
                         batch_size: int | None = None) -> pd.DataFrame:
    """CCNet-style LM quality scoring: train a hashed add-alpha bigram
    model ON the corpus itself (one distributed counting pass), then
    score every document's perplexity under it — low-perplexity ≈
    fluent/common text, high ≈ noise. The curation signal Wenzek et al.
    (CCNet, 2020) gate on, minus the external KenLM dependency (the
    model here is the corpus's own hashed bigram table, so the operator
    is self-contained and deterministic).

    Scale shape: counting emits SPARSE (bucket, cnt) partials per batch
    into a bounded key space (2^16 unigram + 2^20 bigram buckets), so
    the count shuffle is corpus-size-independent; the merged model
    (~8 MB dense) ships once via ``ray.put`` and is cached per worker
    (``bcast_get``); scoring is one vectorized pass — no per-row
    Python, no second shuffle. Hash collisions fold rare grams together
    (standard hashed-LM trade-off; documented, deterministic).

    perplexity = exp(-mean_i log P(w_i | w_{i-1})),
    P = (c_bigram + a) / (c_prev_unigram + a * V), a=0.1, V=2^16.
    Pinned against a brute-force reference in tests (rows-only for the
    driver: the model is not SQL-expressible)."""
    import ray
    from ray.data.aggregate import Sum

    counts = (
        read(sf_dir, "documents", ["text"])
        .map_batches(_lm_count_partial, batch_format="pyarrow",
                     batch_size=batch_size)
        .groupby("bucket").aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    counts = _ensure_cols(counts, {"bucket": "int64", "cnt": "int64"})
    uni = np.zeros(LM_BUCKETS_UNI, dtype=np.int64)
    big = np.zeros(LM_BUCKETS_BI, dtype=np.int64)
    b = counts["bucket"].to_numpy()
    c = counts["cnt"].to_numpy()
    is_uni = b < LM_BUCKETS_UNI
    uni[b[is_uni]] = c[is_uni]
    big[b[~is_uni] - LM_BUCKETS_UNI] = c[~is_uni]
    model_ref = ray.put((uni, big))

    from .common import bcast_get

    def score(t: pa.Table) -> pa.Table:
        m_uni, m_big = bcast_get(model_ref)
        tok, offs = _doc_token_hashes(t)
        n_rows = len(t)
        ppl = np.full(n_rows, np.nan)
        if len(tok):
            uni_h = _lm_hash(tok, LM_BUCKETS_UNI)
            prev = np.roll(tok, 1)
            big_h = _lm_hash(prev * np.int64(1000003) + tok, LM_BUCKETS_BI)
            logp = np.log(
                (m_big[big_h] + LM_ALPHA)
                / (m_uni[_lm_hash(prev, LM_BUCKETS_UNI)]
                   + LM_ALPHA * LM_BUCKETS_UNI))
            first = np.zeros(len(tok), dtype=bool)
            first[offs[:-1][offs[:-1] < len(tok)]] = True
            logp[first] = 0.0
            csum = np.concatenate(([0.0], np.cumsum(logp)))
            per_doc = csum[offs[1:]] - csum[offs[:-1]]
            n_big = np.maximum(offs[1:] - offs[:-1] - 1, 0)
            with np.errstate(divide="ignore", invalid="ignore"):
                ppl = np.where(n_big > 0,
                               np.exp(-per_doc / np.maximum(n_big, 1)),
                               np.nan)
        return pa.table({
            "doc_id": t["doc_id"],
            "perplexity": pa.array(r4(ppl), pa.float64()),
        })

    out = (read(sf_dir, "documents", ["doc_id", "text"])
           .map_batches(score, batch_format="pyarrow",
                        batch_size=batch_size)
           .to_pandas())
    return finish(out, ["doc_id"])


def mixture_weights(sf_dir: str) -> pd.DataFrame:
    """Source mixture balancing — the sampling-weight table a trainer
    uses to hit a TARGET mixture (uniform across sources here) from an
    unbalanced corpus: weight_s = target_share / actual_share, and the
    per-doc sampling rate capped at 1 (never upsample by dropping
    others; rates renormalize downstream). One bounded groupby —
    per-batch count partials, k source rows out."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("source", use_threads=False).aggregate(
            [("source", "count")])
        return pa.table({"source": g["source"],
                         "n": pc.cast(g["source_count"], pa.int64())})

    out = (read(sf_dir, "documents", ["source"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("source").aggregate(Sum("n", alias_name="n_docs"))
           .to_pandas())
    out = _ensure_cols(out, {"source": "str", "n_docs": "int64"})
    if out.empty:
        return pd.DataFrame({"source": pd.Series([], dtype="str"),
                             "n_docs": pd.Series([], dtype="int64"),
                             "weight": pd.Series([], dtype="float64"),
                             "sampling_rate": pd.Series([], dtype="float64")})
    total = int(out["n_docs"].sum())
    k = len(out)
    out["n_docs"] = out["n_docs"].astype("int64")
    out["weight"] = r4((total / k) / out["n_docs"].to_numpy())
    out["sampling_rate"] = r4(np.minimum(
        (total / k) / out["n_docs"].to_numpy(), 1.0))
    return finish(out, ["source"])


def sample_by_mixture(sf_dir: str) -> pd.DataFrame:
    """Materialize a mixture-balanced corpus (the filtering twin of
    ``mixture_weights``): down-sample each LANGUAGE to a uniform target
    share (never up-sampling) with a deterministic md5 threshold, so
    every engine selects the IDENTICAL row set. The per-lang rate table
    is one bounded groupby; the keep decision is exact integer
    arithmetic — doc kept iff int(md5(text)[:8], 16) < floor(rate*2^32)
    — which the SQL oracle reproduces as a lexicographic compare of
    fixed-width hex strings."""
    from ray.data.aggregate import Sum

    def cpartial(t: pa.Table) -> pa.Table:
        g = t.group_by("lang", use_threads=False).aggregate(
            [("lang", "count")])
        return pa.table({"lang": g["lang"],
                         "n": pc.cast(g["lang_count"], pa.int64())})

    counts = (read(sf_dir, "documents", ["lang"])
              .map_batches(cpartial, batch_format="pyarrow")
              .groupby("lang").aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    if counts.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "lang": pd.Series([], dtype="str")})
    total, k = int(counts["n"].sum()), len(counts)
    thresholds: dict[str, int] = {}
    for src, n in zip(counts["lang"], counts["n"]):
        rate = (total / k) / int(n)
        thresholds[str(src)] = (1 << 32) if rate >= 1.0 else int(
            np.floor(rate * 4294967296.0))

    def keep(t: pa.Table) -> pa.Table:
        srcs = t["lang"].to_pylist()
        mask = [
            int(hashlib.md5(x.encode()).hexdigest()[:8], 16)
            < thresholds[s]
            for x, s in zip(t["text"].to_pylist(), srcs)
        ]
        return t.filter(pa.array(mask)).select(["doc_id", "lang"])

    out = (read(sf_dir, "documents", ["doc_id", "lang", "text"])
           .map_batches(keep, batch_format="pyarrow")
           .to_pandas())
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "lang": pd.Series([], dtype="str")})
    return finish(out.astype({"doc_id": "int64"}), ["doc_id"])


def corpus_shuffle_shards(sf_dir: str, n_shards: int = 8) -> pd.DataFrame:
    """Deterministic global training-data shuffle + sharding: every doc
    gets (shard, pos) where shard = doc_id % n_shards and pos is the
    doc's rank within its shard under md5(text) hash order — a
    reproducible pseudo-random permutation with NO RNG state, the order
    a training run streams each shard in. Re-running at any scale or
    engine assigns identical positions (the property a resumable
    100 TB shuffle needs; contrast ``Dataset.random_shuffle``, whose
    output depends on seed + block layout).

    Scale shape: the md5 keys are a pure map; the per-shard rank is a
    ``grouped_apply`` (one sort keyed by shard) — and because shards
    are the PARTITION key, at 100 TB each shard's rank assignment runs
    where its rows land, no global coordination."""
    from .common import grouped_apply

    def key(t: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(t["doc_id"], pa.int64()))
        md5 = [hashlib.md5(x.encode()).hexdigest()
               for x in t["text"].to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "shard": pa.array(ids % n_shards, pa.int64()),
            "h": pa.array(md5, pa.string()),
        })

    def rank(g: pa.Table) -> pa.Table:
        idx = pa.table({
            "h": g["h"], "doc_id": g["doc_id"]
        }).sort_by([("h", "ascending"), ("doc_id", "ascending")])
        return pa.table({
            "doc_id": idx["doc_id"],
            "shard": g["shard"].slice(0, len(g)),
            "pos": pa.array(np.arange(len(g), dtype=np.int64), pa.int64()),
        })

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "shard": pa.array([], pa.int64()),
                      "pos": pa.array([], pa.int64())})
    keyed = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        key, batch_format="pyarrow")
    out = grouped_apply(keyed, ["shard"], rank, empty).to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "shard": pd.Series([], dtype="int64"),
                             "pos": pd.Series([], dtype="int64")})
    return finish(out.astype("int64"), ["doc_id"])


def _bpe_merge_word(syms: tuple, a: str, b: str) -> tuple:
    """Greedy left-to-right non-overlapping merge of (a,b) in a symbol
    sequence — the standard BPE apply step."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_merges(sf_dir: str, n_merges: int = 12) -> pd.DataFrame:
    """Byte-pair-encoding vocabulary training (Sennrich et al. 2016) —
    the ordered merge table (rank, left, right, count) a tokenizer
    build produces.

    Scale shape: BPE trains on the WORD-FREQUENCY DICTIONARY, not the
    corpus (the standard trick — HF tokenizers / SentencePiece do the
    same), so the corpus-sized work is ONE distributed word-count pass
    (per-batch C++ group_by partials → ``grouped_aggregate``); the
    merge loop then runs over the vocabulary table, which is bounded by
    distinct-word count, not corpus bytes (at 100 TB: ~10⁷–10⁸ rows —
    driver-feasible; beyond that each pair-count iteration re-expresses
    as a grouped_aggregate over a vocab Dataset). Deterministic:
    ties break on (max count, lexicographically smallest pair); pair
    counts include every adjacent position; apply is greedy
    left-to-right. Pinned against an independent naive reference in
    tests (rows-only for the driver — merge choices depend on corpus
    statistics, not SQL-expressible)."""
    rules, _ = _bpe_train(sf_dir, n_merges)
    out = pd.DataFrame(rules, columns=["rank", "left", "right", "count"])
    return finish(out.astype({"rank": "int64", "count": "int64"}), ["rank"])


def _bpe_train(sf_dir: str, n_merges: int):
    """Distributed word-count pass + vocabulary merge loop. Returns
    (rules, words) where ``words`` maps each distinct corpus word's
    final symbol tuple to its corpus count — since merging only ever
    concatenates adjacent symbols, ``"".join(syms)`` reconstructs the
    original word, so the dict doubles as word → encoded length."""
    from .common import grouped_aggregate, table_rows

    def wc_partial(t: pa.Table) -> pa.Table:
        flat, _ = _doc_tokens(t)
        cnt = pa.table({"w": flat}).group_by("w", use_threads=False) \
            .aggregate([([], "count_all")])
        return cnt.rename_columns(["w", "c"])

    vocab = grouped_aggregate(
        read(sf_dir, "documents", ["text"])
        .map_batches(wc_partial, batch_format="pyarrow"),
        "w", [("c", "sum")],
        size_hint=table_rows(sf_dir, "documents")).to_pandas()
    words: dict[tuple, int] = {
        tuple(w): int(c) for w, c in zip(vocab["w"], vocab["c_sum"])}

    rules = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, cnt in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + cnt
        if not counts:
            break
        (left, right), best = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((rank, left, right, best))
        merged: dict[tuple, int] = {}
        for syms, cnt in words.items():
            ns = _bpe_merge_word(syms, left, right)
            merged[ns] = merged.get(ns, 0) + cnt
        words = merged
    return rules, words


def bpe_encode(sf_dir: str, n_merges: int = 12, _trained=None) -> pd.DataFrame:
    """Tokenizer APPLICATION — encode every document with the BPE vocab
    ``bpe_merges`` trains, returning (doc_id, n_words, n_tokens): the
    per-doc token count a sequence-packing / training-budget step
    consumes.

    Scale shape: the merge rules are applied ONCE to the distinct-word
    dictionary during training (encoded length = final symbol count per
    word — no per-document merge loops anywhere); the corpus pass is a
    single map_batches that dictionary-encodes each batch's tokens and
    looks up only the batch's DISTINCT words in the broadcast
    word→length dict (``ray.put`` once, per-worker cached via
    ``bcast_get``), then bincounts per-row sums. No OOV handling is
    needed: the vocabulary is built from the same corpus, so every
    token is present by construction. Rows-only for the driver (merge
    choices aren't SQL-expressible); ``bpe_encode_violations`` re-checks
    a deterministic doc sample against an independent per-document
    greedy apply of the rules, and tests pin the full output at small
    scale the same way."""
    import ray

    from .common import bcast_get

    _, words = _trained if _trained is not None \
        else _bpe_train(sf_dir, n_merges)
    n_tok = {"".join(syms): len(syms) for syms in words}
    ref = ray.put(n_tok)

    def per_doc(t: pa.Table) -> pa.Table:
        lut = bcast_get(ref)
        flat, parent = _doc_tokens(t)
        nrows = len(t)
        parent_np = np.asarray(parent)
        enc = pc.dictionary_encode(flat.combine_chunks())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        uniq = enc.dictionary.to_pylist()
        per_uniq = np.array([lut[w] for w in uniq], dtype=np.int64)
        tok_len = per_uniq[np.asarray(enc.indices)] if uniq else \
            np.zeros(0, dtype=np.int64)
        n_words = np.bincount(parent_np, minlength=nrows).astype(np.int64)
        n_tokens = np.bincount(
            parent_np, weights=tok_len, minlength=nrows).astype(np.int64)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
        })

    out = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        per_doc, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "n_words": pd.Series([], dtype="int64"),
                             "n_tokens": pd.Series([], dtype="int64")})
    return finish(out.astype("int64"), ["doc_id"])


def char_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-document character-level Shannon entropy (bits/char) — the
    classic gibberish/binary-junk quality gate (low-entropy docs are
    repeated filler, very-high-entropy docs are random bytes; CCNet/
    Gopher-style curation thresholds both tails).

    Scale shape: pure map — one pass, no exchange. The whole batch is
    vectorized: texts concatenate into ONE utf-32 codepoint array,
    per-(doc, codepoint) counts come from a single ``np.unique`` over a
    packed (doc_idx << 32 | codepoint) key, and the entropy sum per doc
    is one ``np.bincount`` — no per-row Python in the hot loop.
    Rounded to 4 decimals on both sides (float sum order)."""
    from .common import r4

    def ent(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        ids = pc.cast(t["doc_id"], pa.int64())
        lens = np.array([len(s) for s in texts], dtype=np.int64)
        total = int(lens.sum())
        out = np.zeros(len(texts), dtype=np.float64)
        if total:
            cps = np.frombuffer(
                "".join(texts).encode("utf-32-le"), dtype=np.uint32)
            doc_idx = np.repeat(
                np.arange(len(texts), dtype=np.uint64), lens)
            key = (doc_idx << np.uint64(32)) | cps.astype(np.uint64)
            uniq, counts = np.unique(key, return_counts=True)
            u_doc = (uniq >> np.uint64(32)).astype(np.int64)
            p = counts / lens[u_doc]
            out = np.bincount(u_doc, weights=-p * np.log2(p),
                              minlength=len(texts))
        return pa.table({
            "doc_id": ids,
            "entropy": pa.array([r4(v) for v in out], pa.float64()),
        })

    out = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        ent, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "entropy": pd.Series([], dtype="float64")})
    return finish(out, ["doc_id"])


def hybrid_search_rrf(sf_dir: str, k: int = 20, nc: int = 50,
                      rrf_k: int = 60) -> pd.DataFrame:
    """Hybrid lexical+vector retrieval via reciprocal-rank fusion
    (Cormack et al. 2009) — the standard two-leg retrieval composite: a
    BM25 keyword leg and an embedding-cosine leg each produce their
    top-``nc`` candidates, and a document's fused score is
    Σ 1/(rrf_k + rank) over the legs it appears in. Rank-based fusion
    needs no score normalization across legs, which is why it is the
    default in production hybrid search.

    Composition: the lexical leg IS ``keyword_search_bm25`` (two
    streaming passes, per-block partial top-k) and the vector leg IS
    ``ann_topk_cosine`` with the single smallest-vec_id query — both
    already distributed and oracle-matched; the fusion itself touches
    only the two nc-sized toplists on the driver (O(nc), corpus-
    independent). Returns the top-``k`` (rank, doc_id, rrf) rows,
    ties broken by doc_id ascending."""
    from .ann import ann_topk_cosine

    lex = keyword_search_bm25(sf_dir, k=nc)
    vec = ann_topk_cosine(sf_dir, k=nc, n_queries=1)
    lex_rank = {int(d): i + 1 for i, d in enumerate(lex["doc_id"])}
    vec_rank = {int(d): int(r)
                for d, r in zip(vec["neighbor_id"], vec["rank"])}
    cands = sorted(set(lex_rank) | set(vec_rank))
    if not cands:
        return pd.DataFrame({"rank": pd.Series([], dtype="int64"),
                             "doc_id": pd.Series([], dtype="int64"),
                             "rrf": pd.Series([], dtype="float64")})
    # fixed term order (lex + vec) so the float64 sum is bit-identical
    # to the SQL oracle's
    rrf = {
        d: (1.0 / (rrf_k + lex_rank[d]) if d in lex_rank else 0.0)
           + (1.0 / (rrf_k + vec_rank[d]) if d in vec_rank else 0.0)
        for d in cands
    }
    top = sorted(cands, key=lambda d: (-rrf[d], d))[:k]
    from .common import r4

    return pd.DataFrame({
        "rank": pd.Series(np.arange(1, len(top) + 1), dtype="int64"),
        "doc_id": pd.Series(top, dtype="int64"),
        "rrf": pd.Series([r4(rrf[d]) for d in top], dtype="float64"),
    })


# ------------------------------------------------------------------
# Persisted inverted index + indexed BM25 — the text-retrieval analog
# of the persisted IVF/LSH ANN indexes (ops/ann.py) and the bucketed
# fact tables (ops/bucket.py): pay one corpus scan ONCE, then every
# query reads only the postings partitions its terms hash to.

_POSTINGS_BUCKETS = 64


def _postings_index(sf_dir: str, n_buckets: int = _POSTINGS_BUCKETS) -> str:
    """Build (or reuse) the persisted inverted index over ``documents``.

    ONE streaming pass tokenizes every document (same ``\\W+`` lower
    split as ``keyword_search_bm25`` and its DuckDB oracle) and writes
    postings rows ``(tok, doc_id, tf, dl)`` hive-partitioned by
    ``bucket = hash(tok) % n_buckets``. Corpus stats (n_docs and
    n_tokens, INCLUDING zero-token docs) ride the same pass as one
    sentinel row per batch in a dedicated ``bucket=n_buckets``
    partition, so the build never needs a second scan. Cached under
    /tmp keyed by a DATA fingerprint (documents.parquet size +
    mtime_ns) with race-safe atomic publish — the ANN-index protocol
    (round-2 ADVICE).

    Scale notes: the build is map-only + a partitioned write (no
    shuffle — scoring never needs one token's postings co-located); a
    query reads ≤ |terms| of the n_buckets partitions. Documented skew
    caveat: stopword-grade terms make hot buckets — size n_buckets so
    a bucket ≈ a worker's heap share (thousands at 100 TB) and
    stoplist at build if queries may contain them."""
    import os

    from .ann import _publish_dir, _stage_dir
    from .bucket import _BUCKET_ROOT, _bucket_ids

    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    # the bucket layout depends on polars' string hash (bucket.py
    # _bucket_ids, "stable within one polars install"): fold the polars
    # version into the tag so an upgraded install rebuilds instead of
    # silently probing the wrong partitions
    import polars as _pl

    tag = hashlib.blake2b(
        f"{src}:{st.st_size}:{st.st_mtime_ns}:{n_buckets}:"
        f"pl{_pl.__version__}:postings-v1".encode(),
        digest_size=8).hexdigest()
    idx_dir = f"{_BUCKET_ROOT}/postings_{tag}"
    if os.path.isdir(idx_dir):
        return idx_dir

    def postings(t: pa.Table) -> pa.Table:
        flat, parent = _doc_tokens(t)
        par = np.asarray(parent)
        dl_per_row = np.bincount(par, minlength=len(t)).astype(np.int64)
        tt = pa.table({"row": pa.array(par, pa.int64()), "tok": flat})
        g = tt.group_by(["row", "tok"],
                        use_threads=False).aggregate([([], "count_all")])
        rows = g["row"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = pa.table({
            "tok": g["tok"],
            "doc_id": pc.take(pc.cast(t["doc_id"], pa.int64()), g["row"]),
            "tf": pc.cast(g["count_all"], pa.int64()),
            "dl": pa.array(dl_per_row[rows], pa.int64()),
            "bucket": pa.array(_bucket_ids(g["tok"], n_buckets),
                               pa.int32()),
        })
        sent = pa.table({
            "tok": pa.array([""], pa.string()),
            "doc_id": pa.array([-1], pa.int64()),
            "tf": pa.array([len(flat)], pa.int64()),
            "dl": pa.array([len(t)], pa.int64()),
            "bucket": pa.array([n_buckets], pa.int32()),
        })
        return pa.concat_tables([out, sent])

    ds = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        postings, batch_format="pyarrow")
    stage = _stage_dir(idx_dir)
    ds.write_parquet(stage, partition_cols=["bucket"])
    if not os.path.isdir(stage):
        # all-empty corpus: write_parquet creates nothing — publish an
        # explicit empty stats partition so queries see n_docs == 0
        import pyarrow.parquet as pq

        os.makedirs(os.path.join(stage, f"bucket={n_buckets}"))
        pq.write_table(
            pa.table({"tok": pa.array([], pa.string()),
                      "doc_id": pa.array([], pa.int64()),
                      "tf": pa.array([], pa.int64()),
                      "dl": pa.array([], pa.int64())}),
            os.path.join(stage, f"bucket={n_buckets}", "empty.parquet"))
    _publish_dir(stage, idx_dir)
    return idx_dir


def keyword_search_indexed(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """BM25 top-k via the PERSISTED inverted index — the scale twin of
    ``keyword_search_bm25`` (which scans the corpus twice per query).
    Shares its DuckDB oracle: identical query, scoring and tie order.

    Query cost after the amortized build: read the ≤|terms| postings
    partitions the query terms hash to, ONE tiny df partial pass, one
    contribution map + per-doc ``grouped_aggregate`` over candidate
    docs only, per-block top-k partials → driver merges blocks×k rows.
    Per-term contributions are pivoted into fixed columns before the
    sum so the float64 accumulation order is bit-identical to the scan
    path's (term order, then doc)."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from .bucket import _bucket_ids
    from .common import _ensure_cols, grouped_aggregate

    nb = _POSTINGS_BUCKETS
    idx = _postings_index(sf_dir, nb)
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "score": pd.Series([], dtype="float64")})
    sdir = os.path.join(idx, f"bucket={nb}")
    if not os.path.isdir(sdir):
        return empty
    st = pq.read_table(sdir, columns=["tf", "dl"])
    n_docs = int(pc.sum(st["dl"]).as_py() or 0)
    if n_docs == 0:
        return empty
    avgdl = float(pc.sum(st["tf"]).as_py() or 0) / n_docs

    terms = list(BM25_QUERY)
    tb = _bucket_ids(pa.array(terms, pa.string()), nb)
    dirs = sorted({os.path.join(idx, f"bucket={int(b)}") for b in tb})
    files = [os.path.join(d, f)
             for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not files:
        return empty
    post = rd.read_parquet(files).map_batches(
        lambda t: t.filter(pc.is_in(t["tok"],
                                    value_set=pa.array(terms))),
        batch_format="pyarrow")

    # pass 1: document frequency per term (posting rows are
    # (doc, tok)-unique by construction, so df = rows per term)
    def df_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            f"df_{term}": pa.array(
                [int(pc.sum(pc.equal(t["tok"], term)).as_py() or 0)],
                pa.int64())
            for term in terms})

    dfs = post.map_batches(df_partial, batch_format="pyarrow").to_pandas()
    df = {term: (int(dfs[f"df_{term}"].sum()) if len(dfs.columns) else 0)
          for term in terms}
    idf = {term: float(np.log(1.0 + (n_docs - df[term] + 0.5)
                              / (df[term] + 0.5)))
           for term in terms}

    # pass 2: per-posting BM25 contribution, one fixed column per term
    def contrib(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        denom = BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
        cols: dict = {"doc_id": pc.cast(t["doc_id"], pa.int64())}
        for i, term in enumerate(terms):
            m = pc.equal(t["tok"], term).combine_chunks().to_numpy(
                zero_copy_only=False)
            c = np.where(m, idf[term] * tf * (BM25_K1 + 1.0)
                         / (tf + denom), 0.0)
            cols[f"c{i}"] = pa.array(c, pa.float64())
        return pa.table(cols)

    agg = grouped_aggregate(
        post.map_batches(contrib, batch_format="pyarrow"),
        "doc_id", [(f"c{i}", "sum") for i in range(len(terms))],
        size_hint=n_docs)

    def block_top(t: pa.Table) -> pa.Table:
        s = np.zeros(len(t), np.float64)
        for i in range(len(terms)):
            s = s + t[f"c{i}_sum"].to_numpy(zero_copy_only=False)
        keep = s > 0.0
        sub = pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()).filter(
                pa.array(keep)),
            "score": pa.array(s[keep], pa.float64()),
        })
        d = sub.to_pandas().sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort")
        return pa.Table.from_pandas(d.head(k), preserve_index=False)

    parts = agg.map_batches(block_top, batch_format="pyarrow").to_pandas()
    parts = _ensure_cols(parts, {"doc_id": "int64", "score": "float64"})
    top = parts.sort_values(["score", "doc_id"], ascending=[False, True],
                            kind="mergesort").head(k).reset_index(drop=True)
    top["score"] = r4(top["score"])
    return top


def shared_tokens_langs(sf_dir: str, lang_a: str = "en",
                        lang_b: str = "de") -> pd.DataFrame:
    """Distributed INTERSECT: the distinct tokens that appear in
    documents of BOTH languages. Neither side's token set is ever
    materialized — each batch collapses to one (tok, seen_a, seen_b)
    row per distinct token (map-side dedup), the exchange ships those
    flag partials, and ``grouped_aggregate`` max-merges them; the
    intersection is the rows where both flags survived."""
    from .common import grouped_aggregate, table_rows

    def flags(t: pa.Table) -> pa.Table:
        flat, parent = _doc_tokens(t)
        lang = pc.take(t["lang"], parent)
        m = pc.is_in(lang, value_set=pa.array([lang_a, lang_b]))
        tt = pa.table({
            "tok": flat.filter(m),
            "a": pc.cast(pc.equal(lang.filter(m), lang_a), pa.int64()),
            "b": pc.cast(pc.equal(lang.filter(m), lang_b), pa.int64()),
        })
        g = tt.group_by(["tok"], use_threads=False).aggregate(
            [("a", "max"), ("b", "max")])
        return g.rename_columns(["tok", "a", "b"])

    agg = grouped_aggregate(
        read(sf_dir, "documents", ["text", "lang"]).map_batches(
            flags, batch_format="pyarrow"),
        "tok", [("a", "max"), ("b", "max")],
        size_hint=table_rows(sf_dir, "documents"))
    out = agg.map_batches(
        lambda t: t.filter(pc.and_(pc.equal(t["a_max"], 1),
                                   pc.equal(t["b_max"], 1))).select(["tok"]),
        batch_format="pyarrow").to_pandas()
    out = _ensure_cols(out, {"tok": "str"})
    return finish(out, ["tok"])


def chunk_documents(sf_dir: str, size: int = 100,
                    overlap: int = 20) -> pd.DataFrame:
    """RAG / context-window document chunking: explode each document
    into overlapping character-window chunks, one output row per chunk
    — the retrieval-indexing counterpart of ``pack_sequences`` (which
    packs for training; this splits for embedding/retrieval).

    Chunk ``i`` of a doc covers codepoints ``[i*stride, i*stride+size)``
    with ``stride = size - overlap``; a doc of ``L`` codepoints emits
    ``1 + max(ceil((L-size)/stride), 0)`` chunks — the minimum count
    that covers every codepoint, so consecutive chunks share
    ``overlap`` codepoints and NO chunk is fully contained in its
    predecessor (a doc of exactly ``size`` emits one chunk, not a
    redundant overlap tail). An empty doc emits one empty chunk so no
    document silently disappears from the index.

    Scale shape: pure per-row map — embarrassingly parallel, no
    exchange; output streams chunk rows at ~size/stride x input bytes.
    The explode is vectorized per chunk ORDINAL: rows are stably
    grouped by ordinal k and sliced with ONE
    ``pc.utf8_slice_codeunits`` kernel call per k (bounded by
    max-chunks-per-doc, not by rows), then un-permuted back to
    (doc, chunk) order. Slicing is by codepoint on both sides
    (pyarrow utf8_slice_codeunits == Python/DuckDB character
    semantics — verified, not byte slicing)."""
    stride = size - overlap
    if not 0 < stride <= size:
        raise ValueError("need 0 < size - overlap <= size")

    def explode(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        lens = pc.utf8_length(t["text"]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # ceil((L-size)/stride) via floor((L-size+stride-1)//stride);
        # negatives clamp to 0 under floor OR trunc division, so the
        # numpy/DuckDB negative-division difference can't diverge
        n_chunks = np.maximum((lens - size + stride - 1) // stride, 0) + 1
        total = int(n_chunks.sum())
        row_idx = np.repeat(np.arange(len(t), dtype=np.int64), n_chunks)
        first_of_row = np.cumsum(n_chunks) - n_chunks
        chunk_id = (np.arange(total, dtype=np.int64)
                    - np.repeat(first_of_row, n_chunks))
        ri = pa.array(row_idx, pa.int64())
        texts = pc.take(t.column("text"), ri)
        order = np.argsort(chunk_id, kind="stable")
        texts_sorted = pc.take(texts, pa.array(order, pa.int64()))
        if isinstance(texts_sorted, pa.ChunkedArray):
            texts_sorted = texts_sorted.combine_chunks()
        ks, first = np.unique(chunk_id[order], return_index=True)
        bounds = np.append(first, total)
        parts = [
            pc.utf8_slice_codeunits(
                texts_sorted.slice(bounds[j], bounds[j + 1] - bounds[j]),
                start=int(k) * stride, stop=int(k) * stride + size)
            for j, k in enumerate(ks)
        ]
        sorted_chunks = (pa.concat_arrays(parts) if parts
                         else pa.array([], pa.string()))
        inv = np.empty(total, dtype=np.int64)
        inv[order] = np.arange(total, dtype=np.int64)
        chunks = pc.take(sorted_chunks, pa.array(inv, pa.int64()))
        return pa.table({
            "doc_id": pc.take(ids, ri),
            "chunk_id": pa.array(chunk_id, pa.int64()),
            "chunk": chunks,
            "n_chars": pc.cast(pc.utf8_length(chunks), pa.int64()),
        })

    out = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "chunk_id": pd.Series([], dtype="int64"),
            "chunk": pd.Series([], dtype="str"),
            "n_chars": pd.Series([], dtype="int64"),
        })
    return finish(out, ["doc_id", "chunk_id"])
