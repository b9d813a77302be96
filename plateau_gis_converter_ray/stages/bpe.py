"""Distributed BPE (byte-pair-encoding) tokenizer training — the
vocabulary-induction step of a training-data pipeline, Sennrich-2016 style.

The corpus never re-enters the loop: ONE exchange reduces it to the word
vocabulary with counts (the classic trick — pair statistics are a function
of (word, count), and the vocab is orders of magnitude smaller than the
corpus at any scale). Each merge round is then:

1. pair counts: a vectorized flat pass over the vocab's symbol sequences
   (shift-pair within word boundaries, weighted by word count) folded
   through the combiner tree — counts ALL adjacent occurrences, overlap
   included, like the reference algorithm;
2. the driver picks argmax (ties: lexicographically smallest pair —
   deterministic across block orders);
3. the merge applies to the vocab as a vectorized regex replace
   (left-to-right non-overlapping — the reference's greedy merge order).

The per-round vocab is a bounded Dataset (materialized between rounds);
rounds are sequential by nature of the algorithm. pytest pins the merge
table bit-for-bit against a pure-Python reference BPE on the same corpus.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa


def _vocab_ds(ds, text_col: str = "text"):
    """(word, n) vocabulary with counts — one combiner-tree exchange."""
    import pyarrow.compute as pc

    from .treeagg import tree_group_agg

    def words(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column(text_col).cast(pa.string()), " ")
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        w, c = np.unique(
            flat.filter(keep).to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({"word": pa.array(w, pa.string()),
                         "n": pa.array(c.astype(np.int64))})

    return tree_group_agg(
        ds.map_batches(words, batch_format="pyarrow"), ["word"], {"n": ("n", "sum")}
    )


def _rep_of(words: pd.Series) -> pd.Series:
    """Initial symbol sequence: chars separated by spaces + '</w>' marker."""
    return words.map(lambda w: " ".join(list(w)) + " </w>")


def _pair_counts(rep: pd.Series, n: np.ndarray) -> pd.DataFrame:
    """All adjacent symbol pairs across the vocab, weighted by word count —
    flat vectorized (no per-word Python beyond the initial split)."""
    syms = rep.str.split(" ")
    lens = syms.map(len).to_numpy()
    flat = np.concatenate(syms.to_numpy()) if len(syms) else np.array([], object)
    wid = np.repeat(np.arange(len(rep)), lens)
    a, b = flat[:-1], flat[1:]
    same_word = wid[:-1] == wid[1:]
    weight = np.repeat(n, lens)[:-1]
    df = pd.DataFrame(
        {"left": a[same_word], "right": b[same_word], "cnt": weight[same_word]}
    )
    return df.groupby(["left", "right"], as_index=False)["cnt"].sum()


def bpe_train_ds(ds, n_merges: int = 8, text_col: str = "text",
                 local_max_vocab: int = 2_000_000) -> pd.DataFrame:
    """Train ``n_merges`` BPE merges over a documents Dataset.

    Returns the merge table (rank, left, right, cnt) — the tokenizer.

    The vocab is ALREADY a bounded driver table (the documented Zipf
    bound — it was collected once regardless), so below
    ``local_max_vocab`` rows the merge rounds loop on the driver arrays
    directly instead of spinning 8 sequential Dataset executions over the
    same bounded table (the dup_clusters/pagerank size-gated hybrid
    pattern; the distributed rounds remain the >threshold path and are
    force-tested equal via ``local_max_vocab=0``)."""
    from .treeagg import clean_arrow, tree_group_agg

    vocab = _vocab_ds(ds, text_col).to_pandas().sort_values("word")
    rep = _rep_of(vocab["word"].reset_index(drop=True))
    counts = vocab["n"].to_numpy()

    if len(vocab) <= local_max_vocab:
        merges = []
        for rank in range(n_merges):
            pc_df = _pair_counts(rep, counts)
            if not len(pc_df):
                break
            pc_df = pc_df.sort_values(
                ["cnt", "left", "right"], ascending=[False, True, True],
                kind="stable",
            )
            best = pc_df.iloc[0]
            left, right, cnt = (
                str(best["left"]), str(best["right"]), int(best["cnt"])
            )
            merges.append(
                {"rank": rank, "left": left, "right": right, "cnt": cnt}
            )
            pat = re.compile(
                r"(?<!\S)" + re.escape(left) + r" " + re.escape(right)
                + r"(?!\S)"
            )
            # replacement is a regex TEMPLATE: backslashes in tokens must
            # be escaped or they act as group backreferences
            rep = rep.str.replace(
                pat, (left + right).replace("\\", "\\\\"), regex=True
            )
        return pd.DataFrame(merges)

    import ray.data

    state = ray.data.from_arrow(
        clean_arrow(pd.DataFrame({"rep": rep, "n": counts}))
    )
    merges = []
    for rank in range(n_merges):
        def pairs(df: pd.DataFrame) -> pa.Table:
            return clean_arrow(_pair_counts(df["rep"], df["n"].to_numpy()))

        pc_ds = tree_group_agg(
            state.map_batches(pairs, batch_format="pandas"),
            ["left", "right"], {"cnt": ("cnt", "sum")},
        ).to_pandas()
        if not len(pc_ds):
            break
        pc_ds = pc_ds.sort_values(
            ["cnt", "left", "right"], ascending=[False, True, True], kind="stable"
        )
        best = pc_ds.iloc[0]
        left, right, cnt = str(best["left"]), str(best["right"]), int(best["cnt"])
        merges.append(
            {"rank": rank, "left": left, "right": right, "cnt": cnt}
        )
        pat = re.compile(
            r"(?<!\S)" + re.escape(left) + r" " + re.escape(right) + r"(?!\S)"
        )
        # escaped: the replacement is a regex template (see fast path)
        rep_new = (left + right).replace("\\", "\\\\")

        def apply_merge(df: pd.DataFrame) -> pa.Table:
            return clean_arrow(
                pd.DataFrame(
                    {"rep": df["rep"].str.replace(pat, rep_new, regex=True),
                     "n": df["n"].to_numpy()}
                )
            )

        state = state.map_batches(apply_merge, batch_format="pandas").materialize()
    return pd.DataFrame(merges)


def apply_merges_token_counts(words: pd.Series,
                              merges: pd.DataFrame) -> np.ndarray:
    """Symbols per word after applying the merge table in rank order —
    the trained tokenizer's ENCODE side, on unique words (same regex
    greedy-left-to-right semantics as training)."""
    rep = _rep_of(words.reset_index(drop=True))
    for _, m in merges.iterrows():
        pat = re.compile(
            r"(?<!\S)" + re.escape(str(m["left"])) + r" "
            + re.escape(str(m["right"])) + r"(?!\S)"
        )
        rep = rep.str.replace(
            pat,
            (str(m["left"]) + str(m["right"])).replace("\\", "\\\\"),
            regex=True,
        )
    return (rep.str.count(" ") + 1).to_numpy(dtype=np.int64)


def bpe_encode_stats_ds(ds, merges: pd.DataFrame, text_col: str = "text"):
    """Per-document token counts under a trained BPE tokenizer.

    The inference side of the pipeline: embarrassingly parallel (ZERO
    exchanges) — each batch reduces its texts to the batch-local UNIQUE
    word set (Zipf makes that far smaller than the token stream), applies
    the merge table once per unique word, and maps counts back through
    the unique-inverse. The merge table is the model artifact and ships
    with the task fn; with a real vocab-sized tokenizer this becomes the
    actor-pool + ``ray.put`` pattern.

    Output: (doc_id, n_words, n_sym0, n_bpe) — words, char-level symbols
    (chars + </w> per word), and post-merge BPE tokens."""

    def encode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = pc.split_pattern(
            pc.cast(batch.column(text_col), pa.string()), " "
        )
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        docs = batch.column("doc_id").to_numpy()
        row_full = np.repeat(np.arange(len(docs)), lens)
        flat = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=object)
        keep = flat != ""
        flat, row = flat[keep], row_full[keep]
        uniq, inv = np.unique(flat, return_inverse=True)
        bpe_u = apply_merges_token_counts(pd.Series(uniq), merges)
        sym0_u = np.array([len(w) + 1 for w in uniq], dtype=np.int64)
        n_words = np.zeros(len(docs), dtype=np.int64)
        n_sym0 = np.zeros(len(docs), dtype=np.int64)
        n_bpe = np.zeros(len(docs), dtype=np.int64)
        np.add.at(n_words, row, 1)
        np.add.at(n_sym0, row, sym0_u[inv])
        np.add.at(n_bpe, row, bpe_u[inv])
        return pa.table(
            {
                "doc_id": pa.array(docs),
                "n_words": pa.array(n_words),
                "n_sym0": pa.array(n_sym0),
                "n_bpe": pa.array(n_bpe),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def bpe_train_reference(texts: list[str], n_merges: int = 8) -> pd.DataFrame:
    """Pure-Python reference (test oracle): same tie-break, same overlap
    counting, same greedy left-to-right merge application."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[w] += 1
    reps = {w: list(w) + ["</w>"] for w in vocab}
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for w, n in vocab.items():
            r = reps[w]
            for i in range(len(r) - 1):
                pc[(r[i], r[i + 1])] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (left, right), cnt = best
        merges.append({"rank": rank, "left": left, "right": right, "cnt": cnt})
        for w in vocab:
            r = reps[w]
            out, i = [], 0
            while i < len(r):
                if i + 1 < len(r) and r[i] == left and r[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(r[i])
                    i += 1
            reps[w] = out
    return pd.DataFrame(merges)
