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
    """Language-ID heuristic + quality scoring, vectorized across the batch.

    Matches the per-doc kernels (``kernels.text.langid`` /
    ``quality_stats``) value-for-value — pinned by a pytest equality check —
    but runs as pandas ``.str`` kernels instead of a per-row ``.map``:
    distinct-stopword votes become one compiled word-boundary ``contains``
    per stopword (patterns built once per actor in ``__init__``), CJK/alpha/
    word counts become ``str.count`` over compiled classes.
    """

    def __init__(self):
        import re

        from ..kernels.text import _STOPWORDS

        self.langs = sorted(_STOPWORDS)
        # \b-delimited single-stopword patterns: presence <=> the word shows
        # up in the \w+ tokenization (same boundary semantics, see kernel)
        self.presence = {
            lang: [re.compile(rf"\b{w}\b") for w in sorted(_STOPWORDS[lang])]
            for lang in self.langs
        }
        self.en_multi = re.compile(
            r"\b(?:" + "|".join(sorted(_STOPWORDS["en"])) + r")\b"
        )
        self.cjk = re.compile(r"[぀-ヿ一-鿿]")
        self.word = re.compile(r"\w+")
        self.wordchar = re.compile(r"\w")
        self.alpha = re.compile(r"[^\W\d_]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        lower = text.str.lower()
        n = len(batch)

        # --- language id (kernels.text.langid, vectorized) ---
        n_chars = text.str.len().to_numpy()
        cjk_n = text.str.count(self.cjk).to_numpy()
        is_ja = (n_chars > 0) & (cjk_n / np.maximum(n_chars, 1) > 0.1)
        votes = np.zeros((n, len(self.langs)), dtype=np.int64)
        for j, lang in enumerate(self.langs):
            for pat in self.presence[lang]:
                votes[:, j] += lower.str.contains(pat).to_numpy()
        best = votes.argmax(axis=1)  # first max == kernel's sorted-lang scan
        pred = np.array(self.langs, dtype=object)[best]
        pred[votes.max(axis=1) == 0] = "unknown"
        pred[is_ja] = "ja"
        batch["lang_pred"] = pred

        # --- quality features (kernels.text.quality_stats, vectorized) ---
        n_alpha = text.str.count(self.alpha).to_numpy()
        n_words = lower.str.count(self.word).to_numpy()
        n_wordchars = lower.str.count(self.wordchar).to_numpy()
        n_stop = lower.str.count(self.en_multi).to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            batch["alpha_ratio"] = np.where(n_chars > 0, n_alpha / np.maximum(n_chars, 1), 0.0)
            batch["stopword_ratio"] = np.where(n_words > 0, n_stop / np.maximum(n_words, 1), 0.0)
            batch["mean_word_len"] = np.where(n_words > 0, n_wordchars / np.maximum(n_words, 1), 0.0)
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
        from ..kernels.text import lsh_band_keys_batch

        bandkeys[:] = lsh_band_keys_batch(sigs, self.bands)
        # winnowing fingerprint stays per doc: its unique-min chain is
        # data-length dependent (bounded by doc length, not dataset size)
        for i, t in enumerate(texts):
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


class CompressionRatio:
    """zlib compressibility quality signal (the RefinedWeb/Gopher-family
    heuristic: highly repetitive machine-generated text compresses far
    below natural prose; incompressible noise sits near 1.0). The deflate
    call is inherently per-payload (like image decode) but runs at C
    speed; everything around it is vectorized. ``keep`` flags docs whose
    ratio_e6 = comp_len * 1e6 // raw_len falls inside [lo_e6, hi_e6].

    Integer-exact and deterministic for a fixed zlib level, so the pytest
    twin recomputes it directly."""

    def __init__(self, level: int = 6,
                 lo_e6: int = 250_000, hi_e6: int = 800_000):
        import zlib

        self.compress = zlib.compress
        self.level = level
        self.lo = lo_e6
        self.hi = hi_e6

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t.encode() for t in batch.column("text").to_pylist()]
        raw = np.fromiter((len(t) for t in texts), np.int64, len(texts))
        comp = np.fromiter(
            (len(self.compress(t, self.level)) for t in texts),
            np.int64, len(texts),
        )
        ratio = np.where(
            raw > 0, comp * 1_000_000 // np.maximum(raw, 1), 1_000_000
        ).astype(np.int64)
        keep = (ratio >= self.lo) & (ratio <= self.hi)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "raw_len": pa.array(raw),
                "comp_len": pa.array(comp),
                "ratio_e6": pa.array(ratio),
                "keep": pa.array(keep),
            }
        )
