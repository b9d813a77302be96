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
        texts = batch.column("text").to_pylist()
        sigs = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        bandkeys = np.empty((len(texts), self.bands), dtype=np.uint64)
        simhashes = np.empty(len(texts), dtype=np.int64)
        fps = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            h = char_ngram_hashes(t, self.ngram)
            sig = minhash_signature(h, self.num_perm)
            sigs[i] = sig
            bandkeys[i] = lsh_band_keys(sig, self.bands)
            simhashes[i] = simhash64(t)
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
