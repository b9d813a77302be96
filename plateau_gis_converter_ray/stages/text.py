"""Text-analysis stages over the documents table.

Actor-pool classes (regexes compiled once per actor, SURVEY.md §2.8 pattern)
emitting per-doc features: token counts, quality stats, language id,
fingerprints, minhash/simhash signatures. Vectorized with pandas .str where
possible; per-doc numpy hashing for the signature kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels.text import (
    char_ngram_hashes,
    fingerprint64,
    langid,
    lsh_band_keys,
    minhash_signature,
    simhash64,
)


class TextStats:
    """Vectorized token/char/alpha counts (SQL-reproducible integers)."""

    def __init__(self):
        import re

        self.ws = re.compile(r"\S+")
        self.alpha = re.compile(r"[A-Za-z]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        batch["n_tokens"] = text.str.count(r"\S+").astype("int64")
        batch["n_chars_calc"] = text.str.len().astype("int64")
        batch["n_alpha"] = text.str.count(r"[A-Za-z]").astype("int64")
        batch["n_digits"] = text.str.count(r"[0-9]").astype("int64")
        return batch


class LangQuality:
    """Language-ID heuristic + quality scoring per doc (actor pool)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..kernels.text import quality_stats

        feats = batch["text"].map(quality_stats)
        batch["lang_pred"] = batch["text"].map(langid)
        batch["stopword_ratio"] = feats.map(lambda d: d["stopword_ratio"])
        batch["alpha_ratio"] = feats.map(lambda d: d["alpha_ratio"])
        batch["mean_word_len"] = feats.map(lambda d: d["mean_word_len"])
        # simple composite quality score in [0, 1]
        batch["quality"] = (
            0.5 * batch["alpha_ratio"].clip(0, 1)
            + 0.3 * batch["stopword_ratio"].clip(0, 0.5) * 2.0
            + 0.2 * (batch["mean_word_len"].clip(2, 8) - 2.0) / 6.0
        )
        return batch


class Signatures:
    """MinHash signature + LSH band keys + SimHash + fingerprint per doc."""

    def __init__(self, num_perm: int = 64, bands: int = 16, ngram: int = 5):
        self.num_perm = num_perm
        self.bands = bands
        self.ngram = ngram

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.imagecodec import splitmix64

        texts = batch.column("text").to_pylist()
        n = len(texts)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        bandkeys = np.empty((n, self.bands), dtype=np.uint64)
        simhashes = np.empty(n, dtype=np.int64)
        fps = np.empty(n, dtype=np.int64)

        # MinHash vectorized across the whole batch: concatenate all docs'
        # shingle hashes, apply the xor-permutations ONCE over the flat
        # array, then per-doc segmented min via minimum.reduceat — identical
        # values to the per-doc path (same hash exprs, order-free min).
        shingles = [char_ngram_hashes(t, self.ngram) for t in texts]
        lengths = np.array([len(s) for s in shingles], dtype=np.int64)
        flat = (
            np.concatenate(shingles) if n else np.array([], dtype=np.uint64)
        )
        offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        seeds = splitmix64(np.arange(1, self.num_perm + 1, dtype=np.uint64))
        maxv = np.iinfo(np.uint64).max
        for p in range(self.num_perm):
            perm = splitmix64(flat ^ seeds[p])
            if len(flat):
                col = np.minimum.reduceat(perm, np.clip(offsets, 0, len(flat) - 1))
                col = np.where(lengths > 0, col, maxv)
            else:
                col = np.full(n, maxv, dtype=np.uint64)
            sigs[:, p] = col
        from ..kernels.text import simhash64_batch

        simhashes[:] = simhash64_batch(texts)
        for i, t in enumerate(texts):
            bandkeys[i] = lsh_band_keys(sigs[i], self.bands)
            fps[i] = fingerprint64(t)
        out = batch.drop_columns(["text"])
        out = out.append_column(
            "minhash", pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1).astype(np.int64)), self.num_perm
            )
        )
        out = out.append_column(
            "band_keys", pa.FixedSizeListArray.from_arrays(
                pa.array(bandkeys.reshape(-1).astype(np.int64)), self.bands
            )
        )
        out = out.append_column("simhash", pa.array(simhashes))
        out = out.append_column("fingerprint", pa.array(fps))
        return out
