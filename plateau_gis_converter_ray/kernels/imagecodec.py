"""Deterministic synthetic image codec + perceptual hash.

The input table carries images as opaque ``bytes:binary`` with typed metadata
(w, h, fmt) per BASELINE.json's ``input_hint``. Real image libs (PIL/opencv)
are not in this container, so the codecs here are the clearly-documented
deterministic stand-ins (SURVEY instructs: make the Ray-side plumbing real,
stub the codec): ``raw`` (packed RGB), ``ppm`` (P6 header + raw) and ``rle``
(byte run-length) — all lossless, so the decoded-pixel PSNR invariant is
exactly satisfiable and verifiable. A ``jpeg``-like lossy path is stubbed via
quantization (``fmt="quant"``) to exercise the PSNR>=40dB (not equality) gate.

``phash64`` is an average-hash over an 8x8 block-mean downsample — the
64-bit perceptual fingerprint used by the dedup stages (role analogue of the
reference's bit-exact vertex dedup keys, geometry.rs:86,105-122).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "splitmix64",
    "synth_pixels",
    "encode_image",
    "decode_image",
    "phash64",
    "psnr",
    "FORMATS",
]

FORMATS = ("raw", "ppm", "rle", "quant")


def splitmix64(x):
    """Deterministic 64-bit mix (public splitmix64 constants), vectorized.

    uint64 wraparound is intentional (mod-2^64 arithmetic).
    """
    with np.errstate(over="ignore"):
        z = np.asarray(x).astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


_GRIDS: dict = {}  # (w, h) -> (xx/w, yy/h, b_channel) cache; few size combos


def _grids(w: int, h: int):
    key = (w, h)
    g = _GRIDS.get(key)
    if g is None:
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        b = (xx + yy) * (255.0 / (w + h - 2 if w + h > 2 else 1))
        g = _GRIDS[key] = (xx / w, yy / h, b.astype(np.uint8))
    return g


def synth_pixels(idx: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 image for row index ``idx``."""
    return synth_pixels_batch(np.array([idx], dtype=np.int64), w, h)[0]


def synth_pixels_batch(indices: np.ndarray, w: int, h: int) -> np.ndarray:
    """Vectorized synthesis: (n, h, w, 3) uint8 for same-size rows.

    Bit-identical per row to the scalar path (same IEEE expressions,
    broadcast over the batch dimension) — the decode stage groups rows by
    (w, h) and synthesizes each group in one shot. The plane math lives in
    :func:`synth_base_u8` (shared with the no-materialize verifier), so
    generator and verifier agree bit-for-bit by construction.
    """
    base_u8, b8 = synth_base_u8(indices, w, h)
    n = len(base_u8)
    img = np.empty((n, h, w, 3), dtype=np.uint8)
    img[..., 0] = base_u8
    img[..., 1] = base_u8[:, ::-1]
    img[..., 2] = b8[None]
    return img


def synth_base_u8(indices: np.ndarray, w: int, h: int):
    """The synthesis SUB-kernel the verifier compares against without ever
    materializing the (n, h, w, 3) reference stack: channel 0 is
    ``base_u8``, channel 1 its vertical flip (a VIEW), channel 2 the
    constant ``b8`` grid — exactly the three planes
    :func:`synth_pixels_batch` assembles (elementwise float->uint8 cast
    commutes with the flip, so the planes are bit-identical to the
    generator's). Returns (base_u8 (n, h, w), b8 (h, w))."""
    s = splitmix64(np.asarray(indices).astype(np.uint64))
    f1 = 1.0 + (s & np.uint64(7)).astype(np.float64)
    f2 = 1.0 + ((s >> np.uint64(3)) & np.uint64(7)).astype(np.float64)
    ph = ((s >> np.uint64(6)) & np.uint64(255)).astype(np.float64) / 40.0
    xxw, yyh, b8 = _grids(w, h)
    sin_x = np.float32(60.0) * np.sin(
        ((2 * np.pi) * f1[:, None] * xxw[0][None, :] + ph[:, None]).astype(
            np.float32
        )
    )
    cos_y = np.float32(60.0) * np.cos(
        ((2 * np.pi) * f2[:, None] * yyh[:, 0][None, :] - ph[:, None]).astype(
            np.float32
        )
    )
    base = (np.float32(127.5) + sin_x[:, None, :]) + cos_y[:, :, None]
    np.clip(base, 0, 255, out=base)
    return base.astype(np.uint8), b8


def _rle_encode(flat: np.ndarray) -> bytes:
    """Byte-wise run-length: pairs (count<=255, value)."""
    if len(flat) == 0:
        return b""
    change = np.nonzero(np.diff(flat))[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(flat)]])
    out = bytearray()
    for s, e in zip(starts, ends):
        run = int(e - s)
        v = int(flat[s])
        while run > 255:
            out.append(255)
            out.append(v)
            run -= 255
        out.append(run)
        out.append(v)
    return bytes(out)


def _rle_decode(data: bytes) -> np.ndarray:
    arr = np.frombuffer(data, dtype=np.uint8).reshape(-1, 2)
    return np.repeat(arr[:, 1], arr[:, 0])


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    h, w, _ = pixels.shape
    if fmt == "raw":
        return pixels.tobytes()
    if fmt == "ppm":
        return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()
    if fmt == "rle":
        return _rle_encode(pixels.reshape(-1))
    if fmt == "quant":
        # lossy stub: 6-bit quantization -> PSNR ~= 46 dB, safely above the
        # 40 dB invariant gate while still exercising the lossy path
        q = (pixels.astype(np.uint16) >> 2) << 2
        return (q + 2).clip(0, 255).astype(np.uint8).tobytes()
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data, fmt: str, w: int, h: int) -> np.ndarray:
    """Decode bytes (or any buffer, e.g. a zero-copy Arrow memoryview) back
    to (h, w, 3) uint8 pixels."""
    if fmt in ("raw", "quant"):
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    if fmt == "ppm":
        # parse the 3-field P6 header (always < 32 bytes)
        head = bytes(data[:32])
        nl = 0
        pos = 0
        while nl < 3:
            pos = head.index(b"\n", pos) + 1
            nl += 1
        return np.frombuffer(data, dtype=np.uint8, offset=pos).reshape(h, w, 3)
    if fmt == "rle":
        return _rle_decode(data).reshape(h, w, 3)
    raise ValueError(f"unknown fmt {fmt!r}")


def block_channel_sums_u8(stack: np.ndarray) -> np.ndarray:
    """ONE exact int64 pass over a (n, h, w, 3) uint8 stack -> per-block
    per-channel sums (n, 8, 8, 3). Both the 8x8 block-mean grayscale AND
    the per-channel image means derive from this small array, so the
    full-frame stack is read once for both stats (the decode chain is
    DRAM-bound; BASELINE.md 8v32 diagnostic)."""
    n, h, w, _ = stack.shape
    hb, wb = h // 8, w // 8
    # two ordered stages instead of one multi-axis reduce: the first sums
    # over block-rows with a CONTIGUOUS w*3 inner axis (numpy's multi-axis
    # int64 reduce over the strided 6-d view ran ~5x slower — this kernel
    # was the decode chain's dominant cost, not the memory traffic).
    # Integer addition is associative, so the values are bit-identical.
    r1 = np.add.reduce(
        stack.reshape(n, 8, hb, w * 3), axis=2, dtype=np.int64
    )
    return np.add.reduce(r1.reshape(n, 8, 8, wb, 3), axis=3)


def block_means_u8(stack: np.ndarray) -> np.ndarray:
    """Exact 8x8 block-mean grayscale for a (n, h, w, 3) uint8 stack.

    Summation is integer (int64, exact), so the value is the true rational
    block mean rounded ONCE — order-independent and cheap (no full-frame
    float64 gray plane; the flagship decode is DRAM-bound). Both the
    generator's stored phash and the decode stage's recomputed phash use
    THIS function, so they agree bit-for-bit by construction.
    """
    n, h, w, _ = stack.shape
    hb, wb = h // 8, w // 8
    return block_channel_sums_u8(stack).sum(axis=3) / (3.0 * hb * wb)


def phash64(pixels: np.ndarray) -> int:
    """Average-hash: 8x8 block-mean grayscale, bit=1 where above global mean.

    Returns a signed int64 (two's complement) to fit the ``phash:int64``
    column. Requires w and h divisible by 8 (the generator guarantees it).
    Block means are the exact integer-sum form (:func:`block_means_u8`).
    """
    small = block_means_u8(pixels[None])[0]
    bits = (small > small.mean()).reshape(-1)
    v = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            v |= np.uint64(1) << np.uint64(i)
    return int(np.int64(v))


def phash64_batch(gray_small: np.ndarray) -> np.ndarray:
    """Vectorized phash over a (n, 8, 8) stack of block-mean grayscales."""
    n = gray_small.shape[0]
    flat = gray_small.reshape(n, 64)
    bits = flat > flat.mean(axis=1, keepdims=True)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
    return (bits.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64).astype(np.int64)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))
