"""Text-analysis + near-dup kernels for the training-data operators.

These power the dedup / quality / language-ID stages that a 100 TB
training-data pipeline needs (first-class per the build brief, alongside the
reference's operator inventory). All hashing is deterministic (splitmix64 /
polynomial rolling hashes) so results are stable across processes and rounds.
"""

from __future__ import annotations

import re

import numpy as np

from .imagecodec import splitmix64

__all__ = [
    "char_ngram_hashes",
    "minhash_signature",
    "lsh_band_keys",
    "simhash64",
    "jaccard",
    "token_count_ws",
    "token_count_bpeish",
    "quality_stats",
    "langid",
    "fingerprint64",
    "hamming64",
]

_BPEISH = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
_WORD = re.compile(r"\w+", re.UNICODE)

# tiny public stopword sets for the n-gram/stopword language heuristic
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en", "por", "que"},
}


def char_ngram_hashes(text: str, n: int = 5) -> np.ndarray:
    """uint64 hashes of all character n-grams (vectorized rolling window)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) < n:
        b = np.pad(b, (0, n - len(b)), constant_values=32)
    with np.errstate(over="ignore"):
        windows = np.lib.stride_tricks.sliding_window_view(b, n).astype(np.uint64)
        k = np.uint64(1099511628211)  # FNV prime as the polynomial base
        # k^0 .. k^(n-1) mod 2^64 (cumprod wraps like the rolling hash intends)
        powers = np.concatenate(
            [[np.uint64(1)], np.cumprod(np.full(n - 1, k, dtype=np.uint64))]
        ) if n > 1 else np.array([1], dtype=np.uint64)
        return splitmix64((windows * powers[None, :]).sum(axis=1, dtype=np.uint64))


def minhash_signature(hashes: np.ndarray, num_perm: int = 64) -> np.ndarray:
    """MinHash signature via xor-permutations h_i(x) = splitmix64(x ^ seed_i)."""
    seeds = splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64))
    if len(hashes) == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (num_perm, n_shingles) is fine for n_shingles up to a few thousand
    perms = splitmix64(hashes[None, :] ^ seeds[:, None])
    return perms.min(axis=1)


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> np.ndarray:
    """Hash each band of the signature to one uint64 bucket key."""
    return lsh_band_keys_batch(sig[None], bands)[0]


def lsh_band_keys_batch(sigs: np.ndarray, bands: int = 16) -> np.ndarray:
    """Vectorized band keys for an (n, num_perm) signature matrix — the
    per-doc chain runs once per band ROW over the whole batch (identical
    values to the scalar path: same xor/splitmix chain per element)."""
    sigs = np.ascontiguousarray(sigs, dtype=np.uint64)
    n, num_perm = sigs.shape
    rows = num_perm // bands
    banded = sigs[:, : bands * rows].reshape(n, bands, rows)
    acc = np.zeros((n, bands), dtype=np.uint64)
    for r in range(rows):
        acc = splitmix64(acc ^ banded[:, :, r])
    # mix in the band index so buckets from different bands never collide
    return splitmix64(acc ^ np.arange(bands, dtype=np.uint64)[None, :])


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """Vectorized SimHash for a batch of docs (bit-identical to
    :func:`simhash64`): all token hashes concatenated, per-bit sign votes
    accumulated with segmented add.reduceat."""
    tok_lists = [_WORD.findall(t.lower()) for t in texts]
    lengths = np.array([len(ts) for ts in tok_lists], dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.int64)
    if lengths.sum() == 0:
        return out
    cache: dict[str, int] = {}
    flat = np.empty(int(lengths.sum()), dtype=np.uint64)
    pos = 0
    for ts in tok_lists:
        for t in ts:
            h = cache.get(t)
            if h is None:
                h = cache[t] = hash_token(t)
            flat[pos] = h
            pos += 1
    with np.errstate(over="ignore"):
        mixed = splitmix64(flat)
    shifts = np.arange(64, dtype=np.uint64)
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    nonempty = lengths > 0
    # chunk the (n_tokens, 64) bit matrix to bound peak memory (~50 MB):
    # votes accumulate per doc, splitting only at doc boundaries
    votes = np.zeros((len(texts), 64), dtype=np.int64)
    chunk = 100_000
    starts = offsets
    ends = offsets + lengths
    start_doc = 0
    while start_doc < len(texts):
        tok_lo = int(starts[start_doc])
        # greedily take whole docs while the chunk has room; always >= 1 doc
        end_doc = start_doc + 1
        while end_doc < len(texts) and int(ends[end_doc]) - tok_lo <= chunk:
            end_doc += 1
        tok_hi = int(ends[end_doc - 1])
        # token sub-chunks accumulate votes per doc (handles one huge doc)
        for lo in range(tok_lo, max(tok_hi, tok_lo + 1), chunk):
            hi = min(lo + chunk, tok_hi)
            if hi <= lo:
                break
            with np.errstate(over="ignore"):
                bits = (
                    ((mixed[lo:hi, None] >> shifts[None, :]) & np.uint64(1))
                    .astype(np.int32) * 2 - 1
                )
            # docs overlapping [lo, hi): their segment boundaries clipped
            seg_docs = [
                d for d in range(start_doc, end_doc)
                if int(ends[d]) > lo and int(starts[d]) < hi
            ]
            if not seg_docs:
                continue
            local_off = np.clip(
                starts[np.array(seg_docs)] - lo, 0, hi - lo - 1
            ).astype(np.int64)
            votes[np.array(seg_docs)] += np.add.reduceat(bits, local_off, axis=0)
        start_doc = end_doc
    packed = (
        (votes > 0).astype(np.uint64)
        * (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
    ).sum(axis=1, dtype=np.uint64)
    out = np.where(nonempty, packed.astype(np.int64), 0)
    return out


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (charikar-style sign aggregation)."""
    toks = _WORD.findall(text.lower())
    if not toks:
        return 0
    h = splitmix64(
        np.array([np.uint64(hash_token(t)) for t in toks], dtype=np.uint64)
    )
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    v = (bits * 2 - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if v[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(np.int64(out))


def hash_token(tok: str) -> int:
    """Deterministic 64-bit token hash (FNV-1a)."""
    h = 0xCBF29CE484222325
    for byte in tok.encode("utf-8"):
        h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard similarity of two hash sets."""
    sa = np.unique(a)
    sb = np.unique(b)
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 1.0


def hamming64(a, b) -> np.ndarray:
    """Bitwise Hamming distance between int64/uint64 arrays (vectorized)."""
    with np.errstate(over="ignore"):
        x = np.asarray(a).astype(np.uint64) ^ np.asarray(b).astype(np.uint64)
        # SWAR popcount
        x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
        x = (x & np.uint64(0x3333333333333333)) + (
            (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
        )
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def token_count_ws(text: str) -> int:
    """Whitespace token count."""
    return len(text.split())


def token_count_bpeish(text: str) -> int:
    """BPE-ish token count: letter runs, digit runs, single punctuation."""
    return len(_BPEISH.findall(text))


def quality_stats(text: str) -> dict:
    """Length / punctuation / stopword-ratio quality features for one doc."""
    n_chars = len(text)
    toks = text.split()
    n_tokens = len(toks)
    words = _WORD.findall(text.lower())
    n_alpha = sum(c.isalpha() for c in text)
    n_punct = sum(not c.isalnum() and not c.isspace() for c in text)
    stop = _STOPWORDS["en"]
    n_stop = sum(w in stop for w in words)
    mean_wl = (sum(len(w) for w in words) / len(words)) if words else 0.0
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": n_alpha / n_chars if n_chars else 0.0,
        "punct_ratio": n_punct / n_chars if n_chars else 0.0,
        "stopword_ratio": n_stop / len(words) if words else 0.0,
        "mean_word_len": mean_wl,
    }


def langid(text: str) -> str:
    """Stopword-vote language heuristic; 'ja' for CJK-dominant text."""
    cjk = sum(1 for c in text if "぀" <= c <= "ヿ" or "一" <= c <= "鿿")
    if len(text) and cjk / len(text) > 0.1:
        return "ja"
    words = set(_WORD.findall(text.lower()))
    best, best_n = "unknown", 0
    for lang in sorted(_STOPWORDS):
        n = len(words & _STOPWORDS[lang])
        if n > best_n:
            best, best_n = lang, n
    return best


def fingerprint64(text: str, n: int = 8, window: int = 16) -> int:
    """Winnowing-style rolling-hash document fingerprint (min-sampled)."""
    h = char_ngram_hashes(text, n)
    if len(h) == 0:
        return 0
    if len(h) <= window:
        return int(np.int64(h.min().astype(np.uint64)))
    mins = np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1)
    acc = np.uint64(0xCBF29CE484222325)
    for v in np.unique(mins):
        acc = splitmix64(acc ^ v)
    return int(np.int64(acc))
