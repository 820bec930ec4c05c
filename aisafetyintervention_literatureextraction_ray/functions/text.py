"""Text-analysis kernels: token counts, language ID, quality scores,
document fingerprints.  All vectorized (pyarrow.compute / numpy); no
Python row loops in hot paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# keyword sets for the n-gram/stopword language heuristic
_LANG_MARKERS = {
    "en": (" the ", " and ", " of ", " to ", " is "),
    "de": (" der ", " und ", " die ", " das ", " ist "),
    "fr": (" le ", " la ", " et ", " les ", " est "),
    "es": (" el ", " la ", " los ", " que ", " es "),
}


def set_column(batch: pa.Table, name: str, col) -> pa.Table:
    """Append-or-replace a column (keeps these kernels composable)."""
    if name in batch.column_names:
        batch = batch.drop_columns([name])
    return batch.append_column(name, col)


def token_counts(text: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Whitespace token count — matches DuckDB
    ``length(regexp_split_to_array(trim(text), '\\s+'))`` for non-blank
    text (and 0 for blank, which SQL oracles must CASE around)."""
    return pc.count_substring_regex(text, pattern=r"\S+")


def add_token_count(batch: pa.Table, text_col: str = "text",
                    out_col: str = "n_tokens") -> pa.Table:
    return set_column(batch, out_col, token_counts(batch.column(text_col)))


# GPT-2-style pre-tokenizer classes, lookahead-free so the SAME pattern
# runs under RE2 in both this engine and DuckDB: a token is an optional
# leading space + (letter run | digit run | punctuation run), or a
# whitespace run (BPE treats residual whitespace as tokens too).
BPE_TOKEN_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_counts(text: pa.Array | pa.ChunkedArray) -> pa.Array:
    """BPE-ish subword-budget token count (the brief's second counter):
    counts GPT-2-pre-tokenizer-style pieces instead of whitespace
    words, so numbers, punctuation and casing cost what a real BPE
    vocabulary would charge for them.  One vectorized RE2 kernel;
    DuckDB parity via ``length(regexp_extract_all(text, <same re>))``."""
    return pc.count_substring_regex(text, pattern=BPE_TOKEN_RE)


def detect_language(batch: pa.Table, text_col: str = "text",
                    out_col: str = "lang_detected") -> pa.Table:
    """Stopword-marker language ID (n-gram heuristic).

    Fully vectorized: a handful of ``count_substring`` kernels per
    language, argmax per row, "und" (undetermined) when no marker hits.
    """
    padded = pc.binary_join_element_wise(
        " ", pc.utf8_lower(batch.column(text_col)), " ", "")
    scores = []
    langs = list(_LANG_MARKERS)
    for lang in langs:
        s = None
        for marker in _LANG_MARKERS[lang]:
            c = pc.count_substring(padded, pattern=marker)
            s = c if s is None else pc.add(s, c)
        scores.append(pc.cast(s, pa.int64()).to_numpy(zero_copy_only=False))
    M = np.stack(scores)  # (n_langs, n_rows)
    best = M.argmax(axis=0)
    hit = M.max(axis=0) > 0
    out = np.where(hit, np.asarray(langs, dtype=object)[best], "und")
    return set_column(batch, out_col, pa.array(out, type=pa.string()))


def quality_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality features: length, token count, mean word
    length, punctuation ratio, stopword ratio, composite score 0-1."""
    text = batch.column(text_col)
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_tokens = pc.cast(token_counts(text), pa.float64())
    n_punct = pc.cast(
        pc.count_substring_regex(text, pattern=r"[.,;:!?]"), pa.float64())
    padded = pc.binary_join_element_wise(" ", pc.utf8_lower(text), " ", "")
    n_stop = None
    for m in _LANG_MARKERS["en"]:
        c = pc.count_substring(padded, pattern=m)
        n_stop = c if n_stop is None else pc.add(n_stop, c)
    n_stop = pc.cast(n_stop, pa.float64())

    safe_tokens = pc.max_element_wise(n_tokens, 1.0)
    safe_chars = pc.max_element_wise(n_chars, 1.0)
    mean_word_len = pc.divide(n_chars, safe_tokens)
    punct_ratio = pc.divide(n_punct, safe_chars)
    stop_ratio = pc.divide(n_stop, safe_tokens)

    # composite: rewards stopword presence and sane word lengths,
    # penalizes punctuation soup; clamped to [0, 1].
    stop_part = pc.min_element_wise(pc.multiply(stop_ratio, 3.0), 1.0)
    len_part = pc.max_element_wise(
        pc.subtract(1.0, pc.divide(pc.abs(pc.subtract(mean_word_len, 5.0)), 5.0)),
        0.0)
    raw = pc.subtract(
        pc.add(pc.multiply(stop_part, 0.6), pc.multiply(len_part, 0.4)),
        pc.multiply(punct_ratio, 0.5))
    score = pc.min_element_wise(pc.max_element_wise(raw, 0.0), 1.0)
    for name, col in (("n_chars_text", pc.cast(n_chars, pa.int64())),
                      ("n_tokens", pc.cast(n_tokens, pa.int64())),
                      ("mean_word_len", mean_word_len),
                      ("punct_ratio", punct_ratio),
                      ("stop_ratio", stop_ratio),
                      ("quality_score", score)):
        batch = set_column(batch, name, col)
    return batch


def fingerprint64(texts: list[str]) -> np.ndarray:
    """Rolling-hash document fingerprint: XOR of polynomial hashes of
    all 8-codepoint sliding windows, mixed with length.  Order-
    insensitive w.r.t. window multiset but sensitive to any character
    change; fully vectorized per doc (utf-32 view -> stride windows).

    Defined over UNICODE CODEPOINTS with pure mod-2^64 arithmetic so a
    SQL oracle can replay it exactly (DuckDB list lambda over
    ``unicode(txt[i])`` + HUGEINT mod arithmetic — the trigram-oracle
    trick, VERDICT r3 #4).  Texts shorter than 8 codepoints hash as one
    window of their full length with the same weights; empty text is 0.
    """
    out = np.empty(len(texts), dtype=np.uint64)
    weights = np.uint64(2654435761) ** np.arange(8, dtype=np.uint64)
    for i, t in enumerate(texts):
        cps = np.frombuffer((t or "").encode("utf-32-le"),
                            dtype=np.uint32).astype(np.uint64)
        n = len(cps)
        if n == 0:
            out[i] = 0
            continue
        if n >= 8:
            win = np.lib.stride_tricks.sliding_window_view(cps, 8)
            hashes = (win * weights).sum(axis=1)  # wraps mod 2^64
        else:
            hashes = np.array([(cps * weights[:n]).sum()], dtype=np.uint64)
        out[i] = np.uint64(np.bitwise_xor.reduce(hashes)
                           ^ (np.uint64(n) << np.uint64(40)))
    return out


def minimizer_stats(texts: list[str], w: int = 16) -> tuple[
        np.ndarray, np.ndarray, np.ndarray]:
    """Per-doc (w, 8)-minimizer sketch statistics: the rolling 8-gram
    hashes of :func:`fingerprint64`, reduced to the MINIMUM hash of
    every ``w``-window — the winnowing/minimizer sampling scheme
    (Schleimer et al. winnowing; minimap-style sketches) that picks a
    position-robust ~2/(w+1) subset of grams for containment and
    overlap detection.  Returns ``(n_grams, n_windows,
    n_minimizers)`` int64 arrays: gram count, window count, and the
    DISTINCT minimizer count per document.

    Window minima compare in the UNSIGNED 64-bit domain (the raw
    mod-2^64 polynomial value), which a DuckDB oracle replays exactly
    with nonnegative HUGEINTs (``list_aggregate(hs[i:i+w-1], 'min')``)
    — no signed bit view anywhere, because only counts of distinct
    minima leave this function.  Texts shorter than one full window
    produce a single window over whatever grams exist; empty text is
    (0, 0, 0)."""
    n_docs = len(texts)
    n_grams = np.zeros(n_docs, dtype=np.int64)
    n_windows = np.zeros(n_docs, dtype=np.int64)
    n_minimizers = np.zeros(n_docs, dtype=np.int64)
    weights = np.uint64(2654435761) ** np.arange(8, dtype=np.uint64)
    for i, t in enumerate(texts):
        cps = np.frombuffer((t or "").encode("utf-32-le"),
                            dtype=np.uint32).astype(np.uint64)
        n = len(cps)
        if n == 0:
            continue
        if n >= 8:
            win = np.lib.stride_tricks.sliding_window_view(cps, 8)
            hashes = (win * weights).sum(axis=1)  # wraps mod 2^64
        else:
            hashes = np.array([(cps * weights[:n]).sum()],
                              dtype=np.uint64)
        nh = len(hashes)
        if nh >= w:
            mins = np.lib.stride_tricks.sliding_window_view(
                hashes, w).min(axis=1)
        else:
            mins = hashes.min(keepdims=True)
        n_grams[i] = nh
        n_windows[i] = len(mins)
        n_minimizers[i] = len(np.unique(mins))
    return n_grams, n_windows, n_minimizers


def add_fingerprint(batch: pa.Table, text_col: str = "text",
                    out_col: str = "fingerprint") -> pa.Table:
    fp = fingerprint64(batch.column(text_col).to_pylist())
    return set_column(batch, out_col, pa.array(fp, type=pa.uint64()))


# PII rules applied IN ORDER to progressively-redacted text: emails are
# scrubbed before the digit-run rules so a numeric local-part can never be
# double-counted as an SSN/phone.  RE2 patterns — identical semantics in
# pyarrow (count_substring_regex / replace_substring_regex) and DuckDB
# (regexp_extract_all / regexp_replace 'g'), both RE2-based.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def redact_pii(batch: pa.Table, text_col: str = "text",
               out_col: str = "text_redacted") -> pa.Table:
    """Scrub emails / SSN-like ids / phone numbers from ``text_col``,
    emitting ``n_email`` / ``n_ssn`` / ``n_phone`` match counts and the
    redacted text.  Fully vectorized (two RE2 kernels per rule); counts
    are taken on the text AS EACH RULE SEES IT (rule order above), which
    the SQL oracle mirrors with a chained CTE."""
    text = batch.column(text_col)
    for name, pat, repl in PII_RULES:
        n = pc.cast(pc.count_substring_regex(text, pattern=pat), pa.int64())
        batch = set_column(batch, f"n_{name}", n)
        text = pc.replace_substring_regex(text, pattern=pat, replacement=repl)
    return set_column(batch, out_col, text)


def repetition_stats(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Gopher-style repetition quality features per document (Rae et al.
    2021, 'Scaling Language Models' — the repetition-filter family):
    word count, distinct-word ratio, top-word fraction and top-bigram
    fraction.  Tokenization is a plain single-space split, mirroring
    DuckDB ``str_split(text, ' ')`` exactly (empty text -> one empty
    token on both sides).

    Per-batch and per-doc independent, so it runs as a stateless
    ``map_batches`` stage; the heavy lifting is two C hash-groupbys over
    the exploded (doc, word) frame — no Python row loops."""
    import pandas as pd

    words = pc.split_pattern(batch.column(text_col), pattern=" ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    n_words = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    n_words = n_words.astype(np.int64)
    parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    flat = words.flatten()
    wv = flat.to_pandas().to_numpy()

    per = pd.DataFrame({"d": parent, "w": wv}).groupby(
        ["d", "w"], sort=False).size()
    g = per.groupby(level=0)
    n = len(batch)
    n_distinct = np.zeros(n, dtype=np.int64)
    top_w = np.zeros(n, dtype=np.int64)
    n_distinct[g.size().index] = g.size().to_numpy()
    top_w[g.max().index] = g.max().to_numpy()

    # bigrams: adjacent flat positions belonging to the same doc
    same = parent[1:] == parent[:-1]
    top_b = np.full(n, np.nan)
    if same.any():
        bg = pd.Series(wv[:-1][same]).str.cat(
            pd.Series(wv[1:][same]), sep=" ")
        bper = pd.DataFrame({"d": parent[:-1][same], "b": bg.to_numpy()}
                            ).groupby(["d", "b"], sort=False).size()
        bmax = bper.groupby(level=0).max()
        top_b[bmax.index] = bmax.to_numpy()

    safe = n_words.astype(np.float64)
    bigram_den = np.where(n_words > 1, (n_words - 1).astype(np.float64), np.nan)
    return pa.table({
        id_col: batch.column(id_col),
        "n_words": pa.array(n_words),
        "distinct_word_ratio": pa.array(np.round(n_distinct / safe, 6)),
        "top_word_ratio": pa.array(np.round(top_w / safe, 6)),
        # from_pandas=True maps NaN (docs with <2 words) to Arrow null,
        # matching the oracle's LEFT JOIN NULL
        "top_bigram_ratio": pa.array(np.round(top_b / bigram_den, 6),
                                     from_pandas=True),
    })


def word_ngrams(texts: pa.Array | pa.ChunkedArray, n: int = 3
                ) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-token word n-grams, flat: returns ``(parent_idx,
    grams)`` where ``parent_idx[i]`` is the row the gram came from.
    Tokenization mirrors DuckDB ``regexp_split_to_array(trim(text),
    '\\s+')`` exactly (space-only trim, regex split, empty text -> one
    empty token), so SQL oracles can rebuild identical gram sets.
    Vectorized: one regex split kernel + shifted-array equality +
    pandas ``str.cat`` joins — no Python row loop."""
    import pandas as pd

    words = pc.split_pattern_regex(
        pc.utf8_trim(texts, characters=" "), pattern=r"\s+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    wv = words.flatten().to_pandas().to_numpy()
    if len(wv) < n:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
    stop = len(wv) - n + 1
    ok = parent[:stop] == parent[n - 1:]
    s = pd.Series(wv[:stop][ok])
    for j in range(1, n):
        s = s.str.cat(pd.Series(wv[j:stop + j][ok]), sep=" ")
    return parent[:stop][ok].astype(np.int64), s.to_numpy()


def contamination_report(batch: pa.Table, bench_grams, *,
                         text_col: str = "text", id_col: str = "doc_id",
                         n: int = 3) -> pa.Table:
    """Benchmark decontamination check (the n-gram-overlap filter of
    GPT-3 appendix C / PaLM §6 lineage, sized down to trigrams for the
    short synthetic docs): per document, count DISTINCT word n-grams
    that appear in the broadcast benchmark gram set and flag overlap.
    ``bench_grams`` is any pandas-``isin``-able container (a pd.Index)
    shipped once via ``ray.put`` — benchmark suites are MBs against a
    100-TB corpus, the canonical broadcast-small-side case."""
    import pandas as pd

    parent, grams = word_ngrams(batch.column(text_col), n=n)
    hits = np.zeros(len(batch), dtype=np.int64)
    if len(grams):
        dd = pd.DataFrame({"d": parent, "g": grams}).drop_duplicates()
        m = dd["g"].isin(bench_grams)
        if m.any():
            h = dd[m.to_numpy()].groupby("d").size()
            hits[h.index] = h.to_numpy()
    return pa.table({id_col: batch.column(id_col),
                     "n_hits": pa.array(hits),
                     "contaminated": pa.array(hits > 0)})


def chunk_texts(batch: pa.Table, *, chunk_words: int = 64,
                overlap: int = 16, text_col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """Split each document into overlapping fixed-size word windows —
    the RAG / context-window chunking primitive.  Chunk k of a doc
    covers words ``[k*step, k*step + chunk_words)`` (step = chunk_words
    - overlap) for every ``k*step < n_words``; the tail chunk is
    short.  Emits one row per chunk: (id, chunk_id, chunk_text,
    n_words).

    Flat-array construction (offsets + take + ``binary_join``): the
    overlap duplication happens once in a numpy gather, never in a
    Python loop, and output rows stay a single Arrow table so the
    stage composes as a stateless ``map_batches`` (Ray's flat_map
    without per-row overhead)."""
    step = chunk_words - overlap
    if step <= 0:
        raise ValueError("overlap must be < chunk_words")
    words = pc.split_pattern_regex(
        pc.utf8_trim(batch.column(text_col), characters=" "),
        pattern=r"\s+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    lens = pc.list_value_length(words).to_numpy(
        zero_copy_only=False).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    flat = words.flatten()

    counts = (lens - 1) // step + 1  # lens >= 1 always (split of "")
    doc_pos = np.repeat(np.arange(len(lens)), counts)
    cstart = np.concatenate([[0], np.cumsum(counts)])
    k = np.arange(counts.sum()) - np.repeat(cstart[:-1], counts)
    starts = k * step
    clens = np.minimum(chunk_words, lens[doc_pos] - starts)

    cum = np.concatenate([[0], np.cumsum(clens)])
    intra = np.arange(clens.sum()) - np.repeat(cum[:-1], clens)
    idx = np.repeat(offs[doc_pos] + starts, clens) + intra
    vals = flat.take(pa.array(idx))
    la = pa.ListArray.from_arrays(pa.array(cum, type=pa.int32()), vals)
    return pa.table({
        id_col: batch.column(id_col).take(pa.array(doc_pos)),
        "chunk_id": pa.array(k),
        "chunk_text": pc.binary_join(la, " "),
        "n_words": pa.array(clens),
    })


def term_count_partial(t: pa.Table, text_col: str = "text",
                       pattern: str = "[^a-z]+") -> pa.Table:
    """Per-block term histogram for corpus top-terms: lowercase, split
    on the RE2 ``pattern``, flatten, drop empties, count.  Collapses a
    block of documents to one (term, n) row per distinct term BEFORE
    any exchange, so the downstream keyed sum moves histograms, not
    tokens — the combiner pattern that keeps stopword skew off the
    shuffle.  Mirrors DuckDB
    ``unnest(string_split_regex(lower(text), pattern))`` exactly (both
    engines are RE2; '[a-z]' is ASCII-only either way).
    """
    toks = pc.split_pattern_regex(pc.utf8_lower(t[text_col]),
                                  pattern=pattern)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    flat = flat.filter(pc.not_equal(flat, ""))
    vc = pc.value_counts(flat)
    return pa.table({"term": vc.field("values"),
                     "n": pc.cast(vc.field("counts"), pa.int64())})


def ngram_key_partial(t: pa.Table, *, key_col: str = "source",
                      text_col: str = "text", n: int = 3,
                      keep_counts: bool = False) -> pa.Table:
    """Per-block DISTINCT ``(key, gram)`` pairs of word ``n``-grams;
    with ``keep_counts`` the per-key multiplicity survives as ``occ``
    (the bigram-LM scorer's per-document term-frequency combiner).

    Tokenization is whitespace split of the trimmed text — byte-for-byte
    ``regexp_split_to_array(trim(text), '\\s+')`` in DuckDB, so the gram
    STRINGS (not a hash) can key the exchange and the SQL oracle
    replays the counts exactly.  The ragged token->gram expansion is
    pure numpy index arithmetic over the flattened list array; no
    Python loop over rows.  Distinct-per-block is the combiner: a gram
    repeated thousands of times in one block crosses the exchange once.
    """
    # coalesce null text to '' (ADVICE r4): a null row would make
    # list_value_length yield null -> int64-min after astype, wrecking
    # the cumsum offsets below; '' tokenizes to zero grams, matching the
    # oracle (which has no gram rows for null text either way)
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(
            pc.coalesce(t[text_col].cast(pa.string()), "")),
        pattern=r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()

    counts = np.maximum(lens - (n - 1), 0)
    total = int(counts.sum())
    if total == 0:
        out = {key_col: pa.array([], t[key_col].type),
               "gram": pa.array([], pa.string())}
        if keep_counts:
            out["occ"] = pa.array([], pa.int64())
        return pa.table(out)
    doc_idx = np.repeat(np.arange(len(lens)), counts)
    pos = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    off = np.concatenate([[0], np.cumsum(lens)])[:-1]
    j0 = off[doc_idx] + pos
    parts = [flat.take(pa.array(j0 + k)) for k in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    keys = t[key_col].take(pa.array(doc_idx))
    pairs = pa.table({key_col: keys, "gram": grams})
    agg = pa.TableGroupBy(pairs, [key_col, "gram"]).aggregate(
        [([], "count_all")])
    if keep_counts:
        return agg.set_column(agg.schema.get_field_index("count_all"),
                              "occ", pc.cast(agg["count_all"], pa.int64()))
    return agg.drop_columns(["count_all"])


def ngram_source_overlap(ds, *, key_col: str = "source",
                         text_col: str = "text", n: int = 3,
                         num_buckets: int | None = None):
    """Cross-source contamination matrix: for every pair of ``key_col``
    values, the number of DISTINCT word ``n``-grams they share — the
    audit behind benchmark decontamination and inter-source boilerplate
    detection.

    Shape: per-block distinct ``(key, gram)`` partials
    (``ngram_key_partial`` — the combiner), a global distinct reduce
    keyed on the gram exchange, then per-gram pair expansion inside the
    bucketed exchange (one vectorized self-merge per bucket; a gram's
    fan-out is bounded by the number of SOURCES, not documents) and a
    final keyed sum over at most ``n_sources^2 / 2`` rows.  The gram
    STRING keys the exchange so the DuckDB oracle replays counts
    exactly; at corpus scale swap the key for a 64-bit gram hash (same
    topology, opaque key)."""
    import pandas as pd

    from .agg import bucketed_apply, hash_aggregate

    partials = ds.map_batches(
        lambda t: ngram_key_partial(t, key_col=key_col,
                                    text_col=text_col, n=n),
        batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)
    distinct = hash_aggregate(
        partials, [key_col, "gram"], [(key_col, "count")],
        num_buckets=num_buckets, exchange="shuffle",
    ).select_columns([key_col, "gram"])

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="gram")
        ka, kb = f"{key_col}_x", f"{key_col}_y"
        m = m[m[ka] < m[kb]]
        out = (m.groupby([ka, kb]).size().reset_index(name="n_shared"))
        out.columns = ["source_a", "source_b", "n_shared"]
        out["n_shared"] = out["n_shared"].astype("int64")
        return out

    pair_partials = bucketed_apply(distinct, ["gram"], pair_counts,
                                   num_buckets=num_buckets)
    return hash_aggregate(
        pair_partials, ["source_a", "source_b"], [("n_shared", "sum")],
        rename={"n_shared_sum": "n_shared"},
        num_buckets=num_buckets, exchange="shuffle")
