"""Image decode / feature-extract actor-pool stage.

The multimodal analogue of the reference's per-file CityGML parse
(source/citygml.rs:83-177): bytes in, typed features out. Run as
``map_batches(ImageDecodeStats, concurrency=N, batch_format="pyarrow")`` —
an actor pool because decode tables/codec state are built once per actor
(`__init__`), work per batch in ``__call__`` (SURVEY.md §2.8).

Real image libraries are absent in this container; the deterministic codec in
``kernels.imagecodec`` stands in (clearly marked). The Ray-side plumbing —
schema, batch sizing for MB-scale binary payloads, actor signature, output
layout — is real and tested, per the build brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.imagecodec import (
    block_channel_sums_u8,
    block_means_u8,
    decode_image,
    phash64_batch,
    psnr,
    synth_pixels,
)


def binary_views(col) -> list:
    """Zero-copy per-row memoryviews into an Arrow binary column's data
    buffer (``to_pylist`` would copy every payload into Python bytes —
    measurable DRAM traffic at MB-scale payload columns)."""
    views: list = []
    chunks = col.chunks if hasattr(col, "chunks") else [col]
    for chunk in chunks:
        off = chunk.offset
        bufs = chunk.buffers()
        # binary uses int32 offsets, large_binary int64 — reinterpreting
        # one as the other silently yields garbage slices, so branch on
        # the actual type
        odt = np.int64 if pa.types.is_large_binary(chunk.type) else np.int32
        offsets = np.frombuffer(bufs[1], dtype=odt)[off : off + len(chunk) + 1]
        mv = memoryview(bufs[2])
        for i in range(len(chunk)):
            views.append(mv[offsets[i] : offsets[i + 1]])
    return views


def decode_group_stack(blobs: list, rows: list, fmt: str, w: int,
                       h: int) -> np.ndarray:
    """(len(rows), h, w, 3) uint8 stack for one (fmt, w, h) group.

    rle decodes the WHOLE group with one np.repeat over the concatenated
    (count, value) pairs — same-shape images each decode to exactly
    h*w*3 bytes, so the flat run expansion reshapes directly (the
    per-image _rle_decode loop was the decode stage's second-largest
    constant). Other formats keep the per-row view copy (the copy is the
    work; the Python around it is noise)."""
    from ..kernels.imagecodec import decode_image

    if fmt == "rle":
        pairs = np.concatenate(
            [np.frombuffer(blobs[i], dtype=np.uint8) for i in rows]
        ).reshape(-1, 2)
        flat = np.repeat(pairs[:, 1], pairs[:, 0])
        return flat.reshape(len(rows), h, w, 3)
    stack = np.empty((len(rows), h, w, 3), dtype=np.uint8)
    for j, i in enumerate(rows):
        stack[j] = decode_image(blobs[i], fmt, w, h)
    return stack


class ImageDecodeStats:
    """Decode each image and emit per-row features.

    Output columns: image_id, w, h, fmt, caption (pass-through), phash
    (stored), phash_decoded (recomputed from pixels), mean_r/g/b, psnr_db
    (decoded vs deterministic re-synthesis: the BASELINE.json per-row
    invariant — inf for lossless fmts, >=40 dB for the lossy stub).
    """

    def __init__(self, verify_psnr: bool = True):
        self.verify_psnr = verify_psnr

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.imagecodec import synth_pixels_batch

        ids = batch.column("image_id").to_pylist()
        blobs = binary_views(batch.column("bytes"))  # zero-copy payload views
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()

        n = len(ids)
        means = np.empty((n, 3), dtype=np.float64)
        small = np.empty((n, 8, 8), dtype=np.float64)
        psnrs = np.empty(n, dtype=np.float64)

        # group rows by (fmt, w, h): decode into one (g, h, w, 3) stack per
        # group, then every stat (means, 8x8 block means, PSNR re-synthesis)
        # runs vectorized over the stack instead of per image
        groups: dict[tuple, list[int]] = {}
        for i in range(n):
            groups.setdefault((fmts[i], int(ws[i]), int(hs[i])), []).append(i)

        from ..sources.images import source_index

        # PSNR re-synthesis targets the pixel SOURCE row (planted duplicates
        # carry their source's pixels; sources/images.py::source_index)
        idx_all = source_index(np.array([int(s[4:]) for s in ids], dtype=np.int64))
        for (fmt, w, h), rows in groups.items():
            # memory diet (the pipeline is DRAM-bound at full concurrency —
            # BASELINE.md 8v32 diagnostic): every stat reduces straight off
            # the uint8 stack; the only full-frame float64 is the gray plane
            # the phash pins require, and the lossy-PSNR residual is an
            # int16/int64 reduction. Values stay bit-identical to the old
            # float64 path: integer sums below 2^53 are exact in float64,
            # and the divisions reuse np.mean's own expressions.
            stack_u8 = decode_group_stack(blobs, rows, fmt, w, h)
            rows_np = np.array(rows)
            # ONE int64 pass yields both stats: channel means = block-sum
            # marginals / (h*w) (integer sums are exact, and np.mean's
            # float64 pairwise sum of uint8 is exact below 2^53 too, so
            # the values are bit-identical to the two-pass form), and the
            # phash block means = the channel-summed blocks
            hb, wb = h // 8, w // 8
            sums3 = block_channel_sums_u8(stack_u8)  # (g, 8, 8, 3) int64
            means[rows_np] = sums3.sum(axis=(1, 2)) / float(h * w)
            small[rows_np] = sums3.sum(axis=3) / (3.0 * hb * wb)
            if self.verify_psnr:
                # the reference stack is never materialized: the synthesis
                # planes (base, its flip as a VIEW, the constant b8 grid)
                # compare/subtract channel-wise straight off the uint8
                # base plane — one (n,h,w) write instead of the (n,h,w,3)
                # reference + its read-back (kernels.imagecodec
                # synth_base_u8 shares the generator's exact plane math)
                from ..kernels.imagecodec import synth_base_u8

                base_u8, b8 = synth_base_u8(idx_all[rows_np], w, h)
                planes = (base_u8, base_u8[:, ::-1], b8[None])
                if fmt in ("raw", "ppm", "rle"):
                    # lossless: mse == 0 <=> byte equality, so the per-row
                    # invariant checks as a uint8 compare (8x less traffic
                    # than the float path); any mismatch falls through to
                    # the real PSNR so a regression still shows a number
                    eq = (
                        (stack_u8[..., 0] == planes[0]).all(axis=(1, 2))
                        & (stack_u8[..., 1] == planes[1]).all(axis=(1, 2))
                        & (stack_u8[..., 2] == planes[2]).all(axis=(1, 2))
                    )
                    psnrs[rows_np] = np.inf
                    if not eq.all():
                        bad = np.nonzero(~eq)[0]
                        ref = synth_pixels_batch(idx_all[rows_np][bad], w, h)
                        d = stack_u8[bad].astype(np.float64) - ref
                        d *= d
                        mse = d.mean(axis=(1, 2, 3))
                        psnrs[rows_np[bad]] = 10.0 * np.log10(
                            255.0**2 / np.maximum(mse, 1e-300)
                        )
                else:
                    # residual fits int16; squares sum exactly in int64 per
                    # channel and integer addition is associative, so the
                    # channel-split total equals the stacked einsum bit-
                    # for-bit (and exact sum / n == the float path's mse)
                    sumsq = np.zeros(len(rows), dtype=np.int64)
                    for c in range(3):
                        d = stack_u8[..., c].astype(np.int16)
                        np.subtract(d, planes[c], out=d, casting="unsafe")
                        sumsq += np.einsum(
                            "nhw,nhw->n", d, d, dtype=np.int64,
                            casting="unsafe",
                        )
                    mse = sumsq / (h * w * 3)
                    with np.errstate(divide="ignore"):
                        psnrs[rows_np] = np.where(
                            mse == 0, np.inf,
                            10.0 * np.log10(255.0**2 / np.maximum(mse, 1e-300)),
                        )
            else:
                psnrs[rows_np] = np.inf

        out = batch.drop_columns(["bytes"])
        out = out.append_column("phash_decoded", pa.array(phash64_batch(small)))
        out = out.append_column("mean_r", pa.array(means[:, 0]))
        out = out.append_column("mean_g", pa.array(means[:, 1]))
        out = out.append_column("mean_b", pa.array(means[:, 2]))
        out = out.append_column("psnr_db", pa.array(psnrs))
        return out


class ImageResize:
    """Resize-to-thumbnail stage (block-mean downsample to t x t).

    Output keeps metadata and adds a ``thumb`` fixed-size-list<float> column
    (t*t grayscale), the shape a real resize/feature-extract stage would have.
    """

    def __init__(self, t: int = 8):
        self.t = t

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        t = self.t
        n = len(blobs)
        out = np.empty((n, t * t), dtype=np.float32)
        # group rows by (fmt, w, h) and block-mean each stack in one shot
        # (the ImageDecodeStats grouping; values identical to the per-image
        # path — same reduction expressions, batched)
        groups: dict[tuple, list[int]] = {}
        for i in range(n):
            groups.setdefault((fmts[i], int(ws[i]), int(hs[i])), []).append(i)
        for (fmt, w, h), rows in groups.items():
            stack = decode_group_stack(blobs, rows, fmt, w, h)
            # exact channel sum then /3.0 == float64 mean, no uint8->f64 cast
            g = np.add.reduce(stack, axis=3, dtype=np.float64)
            g /= 3.0
            h2, w2 = (h // t) * t, (w // t) * t
            out[np.array(rows)] = (
                g[:, :h2, :w2]
                .reshape(len(rows), t, h2 // t, t, w2 // t)
                .mean(axis=(2, 4))
                .reshape(len(rows), -1)
            )
        thumb = pa.FixedSizeListArray.from_arrays(pa.array(out.reshape(-1)), t * t)
        return batch.drop_columns(["bytes"]).append_column("thumb", thumb)


class QuarantiningDecode:
    """Poison-row tolerant decode: the dead-letter path a 10^12-row corpus
    needs — one corrupt payload must quarantine, not kill the pipeline.

    Rows are validated VECTORIZED first (payload length vs w*h*3 for fixed
    layouts, known-fmt membership, P6 header shape); only rle rows — whose
    validity is only decidable by decoding — pay a per-row try/except.
    Good rows delegate to the normal ``ImageDecodeStats`` stack path; bad
    rows emit the same schema with sentinel stats and a non-empty
    ``quarantine_reason``, so downstream can split with one filter and the
    batch count is conserved (pytest-pinned).
    """

    def __init__(self, verify_psnr: bool = True):
        self.inner = ImageDecodeStats(verify_psnr=verify_psnr)

    _KNOWN = ("raw", "quant", "ppm", "rle")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.imagecodec import _rle_decode

        n = batch.num_rows
        blobs = binary_views(batch.column("bytes"))
        lens = np.array([len(b) for b in blobs], dtype=np.int64)
        ws = batch.column("w").to_numpy().astype(np.int64)
        hs = batch.column("h").to_numpy().astype(np.int64)
        fmts = np.asarray(batch.column("fmt").to_pylist(), dtype=object)

        reason = np.full(n, "", dtype=object)
        known = np.isin(fmts, self._KNOWN)
        reason[~known] = "unknown_fmt"
        fixed = known & ((fmts == "raw") | (fmts == "quant"))
        bad_len = fixed & (lens != ws * hs * 3)
        reason[bad_len] = "truncated"
        for i in np.nonzero(known & (fmts == "ppm"))[0]:
            head = bytes(blobs[i][:32])
            if head[:3] != b"P6\n" or head.count(b"\n", 0, 32) < 3:
                reason[i] = "bad_header"
            else:
                # payload must hold header + pixels: find the 3rd newline
                # exactly like decode_image does, then length-check
                pos, nl = 0, 0
                while nl < 3:
                    pos = head.index(b"\n", pos) + 1
                    nl += 1
                if lens[i] < pos + ws[i] * hs[i] * 3:
                    reason[i] = "truncated"
        for i in np.nonzero(known & (fmts == "rle"))[0]:
            try:
                px = _rle_decode(blobs[i])
                if px.size != ws[i] * hs[i] * 3:
                    reason[i] = "truncated"
            except Exception:
                reason[i] = "corrupt_rle"

        ok = reason == ""
        ok_mask = pa.array(ok)
        good = self.inner(batch.filter(ok_mask))
        good = good.append_column(
            "quarantine_reason", pa.array([""] * good.num_rows, pa.string())
        )
        bad_rows = batch.filter(pa.array(~ok)).drop_columns(["bytes"])
        nb = bad_rows.num_rows
        if nb:
            bad = (
                bad_rows
                .append_column("phash_decoded", pa.array(np.zeros(nb, np.int64)))
                .append_column("mean_r", pa.array(np.full(nb, np.nan)))
                .append_column("mean_g", pa.array(np.full(nb, np.nan)))
                .append_column("mean_b", pa.array(np.full(nb, np.nan)))
                .append_column("psnr_db", pa.array(np.full(nb, np.nan)))
                .append_column(
                    "quarantine_reason",
                    pa.array(reason[~ok].tolist(), pa.string()),
                )
            )
            return pa.concat_tables([good, bad]).combine_chunks()
        return good


class ImageSharpness:
    """Variance-of-Laplacian blur metric per image — the classic
    training-data sharpness filter (blurry images score near zero).

    Gray plane = channel sum (int32, 0..765, no rounding); Laplacian =
    4-neighbor stencil over the interior; the emitted statistics are EXACT
    int64 sums (sum L, sum L^2, interior pixel count) so any consumer can
    reproduce the variance bit-for-bit; ``sharpness`` is the float64
    variance computed from them with one fixed expression. Decode groups by
    (fmt, w, h) and every group runs one vectorized stencil over the stack
    — no per-image Python beyond the group loop. Scale: zero exchanges,
    payload bytes never leave the decode task.
    """

    def __init__(self, blur_threshold: float = 100.0):
        self.blur_threshold = float(blur_threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id")
        blobs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()

        n = batch.num_rows
        s1 = np.zeros(n, dtype=np.int64)
        s2 = np.zeros(n, dtype=np.int64)
        cnt = np.zeros(n, dtype=np.int64)

        groups: dict[tuple, list[int]] = {}
        for i in range(n):
            groups.setdefault((fmts[i], int(ws[i]), int(hs[i])), []).append(i)
        for (fmt, w, h), rows in groups.items():
            stack = decode_group_stack(blobs, rows, fmt, w, h)
            gray = stack.sum(axis=3, dtype=np.int32)  # (g, h, w) 0..765
            lap = (
                4 * gray[:, 1:-1, 1:-1]
                - gray[:, :-2, 1:-1]
                - gray[:, 2:, 1:-1]
                - gray[:, 1:-1, :-2]
                - gray[:, 1:-1, 2:]
            )
            rows_np = np.array(rows)
            # int64 accumulate: |lap| <= 3060, lap^2 <= ~9.4e6, x h*w < 2^63
            s1[rows_np] = lap.sum(axis=(1, 2), dtype=np.int64)
            lap64 = lap.astype(np.int64)
            s2[rows_np] = (lap64 * lap64).sum(axis=(1, 2))
            cnt[rows_np] = (h - 2) * (w - 2)

        fs1 = s1.astype(np.float64)
        var = s2.astype(np.float64) / cnt - (fs1 / cnt) * (fs1 / cnt)
        return pa.table(
            {
                "image_id": ids,
                "w": batch.column("w"),
                "h": batch.column("h"),
                "fmt": batch.column("fmt"),
                "lap_sum": pa.array(s1),
                "lap_sq_sum": pa.array(s2),
                "n_interior": pa.array(cnt),
                "sharpness": pa.array(var),
                "is_blurry": pa.array(var < self.blur_threshold),
            }
        )


class ImageIntegralBlocks:
    """Summed-area-table (integral image) block sums per image — the CV
    primitive behind Haar features / box filters / adaptive thresholds.

    Gray plane = channel sum (int64-safe, 0..765). The SAT builds with two
    cumsums over the whole (fmt, w, h) stack; the four quadrant sums then
    read off as ONE corner-algebra gather each (sum of rect = SAT[b2,r2] -
    SAT[b2,r1] - SAT[b1,r2] + SAT[b1,r1]). Emitted stats are EXACT int64
    (quadrant sums + total), pinned in pytest against direct per-quadrant
    `.sum()` recomputes — the pin validates the corner algebra. Scale:
    zero exchanges, payload bytes never leave the decode task; the SAT is
    (h+1)(w+1) int64 per image, amortized across the stack.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id")
        blobs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        n = batch.num_rows
        q = np.zeros((n, 4), dtype=np.int64)
        tot = np.zeros(n, dtype=np.int64)

        groups: dict[tuple, list[int]] = {}
        for i in range(n):
            groups.setdefault((fmts[i], int(ws[i]), int(hs[i])), []).append(i)
        for (fmt, w, h), rows in groups.items():
            stack = decode_group_stack(blobs, rows, fmt, w, h)
            gray = stack.sum(axis=3, dtype=np.int64)  # (g, h, w)
            sat = np.zeros((len(rows), h + 1, w + 1), dtype=np.int64)
            sat[:, 1:, 1:] = gray.cumsum(axis=1).cumsum(axis=2)
            hm, wm = h // 2, w // 2
            rows_np = np.array(rows)

            def rect(r1, c1, r2, c2):
                return (
                    sat[:, r2, c2]
                    - sat[:, r1, c2]
                    - sat[:, r2, c1]
                    + sat[:, r1, c1]
                )

            q[rows_np, 0] = rect(0, 0, hm, wm)
            q[rows_np, 1] = rect(0, wm, hm, w)
            q[rows_np, 2] = rect(hm, 0, h, wm)
            q[rows_np, 3] = rect(hm, wm, h, w)
            tot[rows_np] = sat[:, h, w]

        return pa.table(
            {
                "image_id": ids,
                "fmt": batch.column("fmt"),
                "q00": pa.array(q[:, 0]),
                "q01": pa.array(q[:, 1]),
                "q10": pa.array(q[:, 2]),
                "q11": pa.array(q[:, 3]),
                "total": pa.array(tot),
            }
        )


class ImageEqualize:
    """Global histogram equalization per image (the classic contrast
    normalization): gray plane = channel sum (0..765), the 766-bin CDF
    maps each level to floor((cdf(v) - cdf_min) * 255 / (n_px - cdf_min))
    — all integer, bit-deterministic. Histograms for a whole (fmt, w, h)
    stack build with ONE np.add.at scatter; the remap is a gather.
    Emits exact before/after stats (int64 sums + an equalized checksum),
    never the remapped pixels — zero exchanges, payload stays in-task.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        n = batch.num_rows

        gray_sum = np.zeros(n, dtype=np.int64)
        eq_sum = np.zeros(n, dtype=np.int64)
        eq_checksum = np.zeros(n, dtype=np.int64)

        groups: dict[tuple, list[int]] = {}
        for i in range(n):
            groups.setdefault((fmts[i], int(ws[i]), int(hs[i])), []).append(i)
        for (fmt, w, h), rows in groups.items():
            stack = decode_group_stack(blobs, rows, fmt, w, h)
            gray = stack.sum(axis=3, dtype=np.int32)  # (g, h, w) 0..765
            g = len(rows)
            npx = h * w
            flat = gray.reshape(g, npx)
            hist = np.zeros((g, 766), dtype=np.int64)
            np.add.at(
                hist,
                (np.repeat(np.arange(g), npx), flat.ravel()),
                1,
            )
            cdf = hist.cumsum(axis=1)
            # per image: first nonzero cdf value (cdf of the min level)
            cdf_min = cdf[np.arange(g), (hist > 0).argmax(axis=1)]
            den = np.maximum(npx - cdf_min, 1)
            lut = (cdf - cdf_min[:, None]) * 255 // den[:, None]
            lut = np.clip(lut, 0, 255).astype(np.int64)
            eq = np.take_along_axis(lut, flat, axis=1)  # (g, npx)
            rows_np = np.array(rows)
            gray_sum[rows_np] = flat.sum(axis=1, dtype=np.int64)
            eq_sum[rows_np] = eq.sum(axis=1, dtype=np.int64)
            # exact positional checksum so any remap change is visible
            wts = (np.arange(npx, dtype=np.int64) % 251) + 1
            eq_checksum[rows_np] = (eq * wts[None, :]).sum(axis=1)

        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "w": batch.column("w"),
                "h": batch.column("h"),
                "fmt": batch.column("fmt"),
                "gray_sum": pa.array(gray_sum),
                "eq_sum": pa.array(eq_sum),
                "eq_checksum": pa.array(eq_checksum),
            }
        )


class ImageLetterbox:
    """Letterbox / pillarbox border detection — the training-data cleaning
    op that finds constant-color bars around the content (padded crops,
    video stills, screenshots) so a downstream crop can remove them.

    A row is a border row when EVERY pixel in it equals that edge's anchor
    corner pixel (all three channels): top anchors at (0, 0), bottom at
    (h-1, w-1), left at (0, 0), right at (h-1, w-1). Margins are the run
    lengths of border rows/columns from each edge (h or w when the whole
    image is one constant color — the degenerate full-frame bar). All
    comparisons are exact uint8 equality, so the result is
    bit-deterministic and pinned against a naive per-image recompute.

    Vectorization: one (g, h, w) all-channel equality reduce per (fmt, w,
    h) stack, then per-edge run lengths via argmax over the negated row /
    column masks — no per-image Python. Zero exchanges; payload bytes
    never leave the decode task.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        n = batch.num_rows

        top = np.zeros(n, dtype=np.int64)
        bottom = np.zeros(n, dtype=np.int64)
        left = np.zeros(n, dtype=np.int64)
        right = np.zeros(n, dtype=np.int64)

        def _leading(mask: np.ndarray, full: int) -> np.ndarray:
            """Per image: length of the leading True run along axis 1."""
            nm = ~mask
            return np.where(nm.any(axis=1), nm.argmax(axis=1), full)

        groups: dict[tuple, list[int]] = {}
        for i in range(n):
            groups.setdefault((fmts[i], int(ws[i]), int(hs[i])), []).append(i)
        for (fmt, w, h), rows in groups.items():
            stack = decode_group_stack(blobs, rows, fmt, w, h)  # (g,h,w,3)
            c00 = stack[:, :1, :1, :]        # (g,1,1,3) top-left anchor
            c11 = stack[:, -1:, -1:, :]      # bottom-right anchor
            eq00 = (stack == c00).all(axis=3)  # (g,h,w)
            eq11 = (stack == c11).all(axis=3)
            row00 = eq00.all(axis=2)         # (g,h) rows of the 00 color
            row11 = eq11.all(axis=2)
            col00 = eq00.all(axis=1)         # (g,w)
            col11 = eq11.all(axis=1)
            rows_np = np.array(rows)
            top[rows_np] = _leading(row00, h)
            bottom[rows_np] = _leading(row11[:, ::-1], h)
            left[rows_np] = _leading(col00, w)
            right[rows_np] = _leading(col11[:, ::-1], w)

        boxed = (top > 0) | (bottom > 0) | (left > 0) | (right > 0)
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "w": batch.column("w"),
                "h": batch.column("h"),
                "fmt": batch.column("fmt"),
                "margin_top": pa.array(top),
                "margin_bottom": pa.array(bottom),
                "margin_left": pa.array(left),
                "margin_right": pa.array(right),
                "is_letterboxed": pa.array(boxed),
            }
        )


def _run_min_sweep(lab2d: np.ndarray, fg2d: np.ndarray) -> np.ndarray:
    """Broadcast the min label over every horizontal fg run of every row
    (rows never merge: run starts reset at column 0). One reduceat + one
    gather over the flat array."""
    f = fg2d.ravel()
    v = lab2d.ravel()
    start = fg2d.copy()
    start[:, 1:] &= ~fg2d[:, :-1]
    s = start.ravel()
    idx = np.flatnonzero(s)
    if not len(idx):
        return lab2d
    seg_min = np.minimum.reduceat(v, idx)
    rid = np.cumsum(s) - 1
    out = v.copy()
    out[f] = seg_min[rid[f]]
    return out.reshape(lab2d.shape)


class RasterBlobCount:
    """Connected-component (blob) labeling per image — the raster
    segmentation primitive (building-footprint extraction, cloud masking).

    Foreground = gray (channel sum, 0..765) >= ``threshold``; components
    are 4-connected. Labeling is run-length min propagation run VECTORIZED
    over the whole (g, h, w) decode stack: labels init to the global
    linear index (which encodes the image, so images can never bleed into
    each other), then each round broadcasts the min over every horizontal
    fg run (one reduceat + gather over the flat stack), then every
    vertical run, until a fixpoint. A full straight run collapses in ONE
    step, so rounds = the worst component's TURN count, not its path
    length; exact for any input (the loop runs to convergence).
    Zero exchanges; pixel bytes never leave the decode task. Emits exact
    per-image counts pinned against a scalar BFS in pytest.
    """

    def __init__(self, threshold: int = 384):
        self.threshold = int(threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id")
        blobs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()

        n = batch.num_rows
        n_blobs = np.zeros(n, dtype=np.int64)
        fg_px = np.zeros(n, dtype=np.int64)
        max_blob = np.zeros(n, dtype=np.int64)

        groups: dict[tuple, list[int]] = {}
        for i in range(n):
            groups.setdefault((fmts[i], int(ws[i]), int(hs[i])), []).append(i)
        for (fmt, w, h), rows in groups.items():
            stack = decode_group_stack(blobs, rows, fmt, w, h)
            gray = stack.sum(axis=3, dtype=np.int32)  # (g, h, w)
            fg = gray >= self.threshold
            g = len(rows)
            big = np.int64(g * h * w)
            lab = np.where(
                fg, np.arange(g * h * w, dtype=np.int64).reshape(g, h, w), big
            )
            fg_t = np.ascontiguousarray(fg.transpose(0, 2, 1))
            while True:
                prev = lab
                l2 = _run_min_sweep(
                    lab.reshape(g * h, w), fg.reshape(g * h, w)
                ).reshape(g, h, w)
                lt = np.ascontiguousarray(l2.transpose(0, 2, 1))
                lt = _run_min_sweep(
                    lt.reshape(g * w, h), fg_t.reshape(g * w, h)
                ).reshape(g, w, h)
                lab = np.ascontiguousarray(lt.transpose(0, 2, 1))
                if np.array_equal(lab, prev):
                    break
            flat = lab[fg]
            rows_np = np.array(rows)
            if len(flat):
                uniq, counts = np.unique(flat, return_counts=True)
                img_of_label = (uniq // (h * w)).astype(np.int64)
                n_blobs[rows_np] = np.bincount(img_of_label, minlength=g)
                mb = np.zeros(g, dtype=np.int64)
                np.maximum.at(mb, img_of_label, counts)
                max_blob[rows_np] = mb
            fg_px[rows_np] = fg.sum(axis=(1, 2), dtype=np.int64)

        return pa.table(
            {
                "image_id": ids,
                "fmt": batch.column("fmt"),
                "n_blobs": pa.array(n_blobs),
                "fg_px": pa.array(fg_px),
                "max_blob": pa.array(max_blob),
            }
        )


def blob_count_brute(img: np.ndarray, threshold: int = 384):
    """Scalar BFS reference for the RasterBlobCount pytest pin.
    Returns (n_blobs, fg_px, max_blob) for one (h, w, 3) uint8 image."""
    gray = img.sum(axis=2, dtype=np.int32)
    fg = gray >= threshold
    h, w = fg.shape
    seen = np.zeros_like(fg)
    n_blobs = 0
    max_blob = 0
    for r in range(h):
        for cc in range(w):
            if not fg[r, cc] or seen[r, cc]:
                continue
            n_blobs += 1
            size = 0
            stack = [(r, cc)]
            seen[r, cc] = True
            while stack:
                i, j = stack.pop()
                size += 1
                for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    ii, jj = i + di, j + dj
                    if 0 <= ii < h and 0 <= jj < w and fg[ii, jj] \
                            and not seen[ii, jj]:
                        seen[ii, jj] = True
                        stack.append((ii, jj))
            max_blob = max(max_blob, size)
    return n_blobs, int(fg.sum()), max_blob


class ImagePatches:
    """ViT-style patch statistics: each image splits into a ``grid x grid``
    tile of patches (floor-split boundaries ``(i*h)//grid``, so any h, w
    work) and every patch emits its EXACT int64 gray sum + pixel count —
    the pre-tokenization feature a vision-training curation pass runs to
    drop flat/low-information patches before pixel shipping.

    Vectorized per (fmt, w, h) decode group: gray plane = channel sum,
    then TWO ``np.add.reduceat`` passes (rows, then cols) realize every
    patch sum for the whole stack — no per-image or per-patch Python. The
    1 -> grid^2 explode happens on metadata-sized rows; payload bytes
    never leave the task and nothing shuffles. ``patch_mean`` is the one
    float column, computed from the exact ints with a single division.
    """

    def __init__(self, grid: int = 4):
        self.grid = int(grid)

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.grid
        ids = batch.column("image_id").to_pylist()
        blobs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        n = batch.num_rows

        sums = np.zeros((n, g, g), dtype=np.int64)
        sqs = np.zeros((n, g, g), dtype=np.int64)
        npx = np.zeros((n, g, g), dtype=np.int64)

        groups: dict[tuple, list[int]] = {}
        for i in range(n):
            groups.setdefault((fmts[i], int(ws[i]), int(hs[i])), []).append(i)
        for (fmt, w, h), rows in groups.items():
            stack = decode_group_stack(blobs, rows, fmt, w, h)
            gray = stack.sum(axis=3, dtype=np.int64)  # (m, h, w) 0..765

            def _patch_sums(plane):
                eh = (np.arange(g + 1, dtype=np.int64) * h) // g
                ew = (np.arange(g + 1, dtype=np.int64) * w) // g
                part = np.add.reduceat(plane, eh[:-1], axis=1)  # (m, g, w)
                return np.add.reduceat(part, ew[:-1], axis=2), eh, ew

            part, eh, ew = _patch_sums(gray)
            sq, _, _ = _patch_sums(gray * gray)
            rows_np = np.array(rows)
            sums[rows_np] = part
            sqs[rows_np] = sq
            npx[rows_np] = np.diff(eh)[:, None] * np.diff(ew)[None, :]

        pr = np.tile(np.repeat(np.arange(g, dtype=np.int64), g), n)
        pc = np.tile(np.arange(g, dtype=np.int64), g * n)
        flat_s = sums.reshape(-1)
        flat_q = sqs.reshape(-1)
        flat_n = npx.reshape(-1)
        fn = flat_n.astype(np.float64)
        mean = flat_s.astype(np.float64) / fn
        var = flat_q.astype(np.float64) / fn - mean * mean
        return pa.table(
            {
                "image_id": pa.array(np.repeat(np.array(ids, object), g * g)),
                "patch_row": pa.array(pr),
                "patch_col": pa.array(pc),
                "gray_sum": pa.array(flat_s),
                "gray_sq_sum": pa.array(flat_q),
                "n_px": pa.array(flat_n),
                "patch_mean": pa.array(mean),
                "patch_var": pa.array(var),
            }
        )


class ImageEntropy:
    """Shannon entropy of the gray-level histogram per image — the
    information-content curation filter (near-uniform synthetic frames,
    letterboxes and flat fills score low and get dropped before training).

    Gray plane = channel sum (766 levels, no rounding); the whole
    (fmt, w, h) stack builds its (m, 766) histogram matrix with ONE
    np.add.at scatter over img_idx*766 + level; entropy is the fixed
    ascending-bin-order reduction -sum(p * ln p) per row, so the float
    result is bit-deterministic (no data-dependent accumulation order).
    Emits (image_id, n_px, n_levels, entropy_nats) — zero exchanges,
    payload never leaves the decode task.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id")
        blobs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        n = batch.num_rows

        ent = np.zeros(n, dtype=np.float64)
        nlev = np.zeros(n, dtype=np.int64)
        npx = np.zeros(n, dtype=np.int64)

        groups: dict[tuple, list[int]] = {}
        for i in range(n):
            groups.setdefault((fmts[i], int(ws[i]), int(hs[i])), []).append(i)
        for (fmt, w, h), rows in groups.items():
            stack = decode_group_stack(blobs, rows, fmt, w, h)
            gray = stack.sum(axis=3, dtype=np.int64)  # (m, h, w) 0..765
            m = len(rows)
            flat = (
                np.arange(m, dtype=np.int64)[:, None, None] * 766 + gray
            ).ravel()
            hist = np.bincount(flat, minlength=m * 766).reshape(m, 766)
            p = hist / float(h * w)
            with np.errstate(divide="ignore", invalid="ignore"):
                terms = np.where(hist > 0, -p * np.log(p), 0.0)
            rows_np = np.array(rows)
            ent[rows_np] = terms.sum(axis=1)  # fixed bin order: exact repeat
            nlev[rows_np] = (hist > 0).sum(axis=1)
            npx[rows_np] = h * w

        return pa.table(
            {
                "image_id": ids,
                "fmt": batch.column("fmt"),
                "n_px": pa.array(npx),
                "n_levels": pa.array(nlev),
                "entropy_nats": pa.array(ent),
            }
        )


def ssim_windows_batch(x: np.ndarray, y: np.ndarray, win: int = 8) -> np.ndarray:
    """Mean SSIM over non-overlapping ``win`` x ``win`` uniform windows for a
    (g, h, w) float64 gray stack pair — the Wang et al. index with a uniform
    (not Gaussian) window and population statistics, the form most batch
    quality monitors ship. Returns (g,) float64 in [-1, 1]."""
    g, h, w = x.shape
    H, W = (h // win) * win, (w // win) * win
    xw = x[:, :H, :W].reshape(g, H // win, win, W // win, win)
    yw = y[:, :H, :W].reshape(g, H // win, win, W // win, win)
    m = float(win * win)
    sx = xw.sum(axis=(2, 4))
    sy = yw.sum(axis=(2, 4))
    sxx = (xw * xw).sum(axis=(2, 4))
    syy = (yw * yw).sum(axis=(2, 4))
    sxy = (xw * yw).sum(axis=(2, 4))
    mux, muy = sx / m, sy / m
    vx = sxx / m - mux * mux
    vy = syy / m - muy * muy
    cov = sxy / m - mux * muy
    c1 = (0.01 * 255.0) ** 2
    c2 = (0.03 * 255.0) ** 2
    s = ((2.0 * mux * muy + c1) * (2.0 * cov + c2)) / (
        (mux * mux + muy * muy + c1) * (vx + vy + c2)
    )
    return s.mean(axis=(1, 2))


class ImageSSIM:
    """Per-image SSIM against the deterministic re-synthesis — the
    perceptual sibling of the psnr_db invariant (BASELINE.json per-row
    check): lossless fmts score exactly 1.0, the lossy stub lands high
    but < 1. Emits ``ssim_ppm = round(ssim * 1e6)`` as int64 so every
    downstream aggregate is an order-free exact integer sum (float
    accumulation order across Ray blocks would jitter a mean).

    Same decode discipline as ImageDecodeStats: zero-copy payload views,
    one (fmt, w, h) group stack, fully vectorized window statistics.
    """

    def __init__(self, win: int = 8):
        self.win = win

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.imagecodec import synth_pixels_batch
        from ..sources.images import source_index

        ids = batch.column("image_id").to_pylist()
        blobs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        n = len(ids)
        ppm = np.empty(n, dtype=np.int64)

        groups: dict[tuple, list[int]] = {}
        for i in range(n):
            groups.setdefault((fmts[i], int(ws[i]), int(hs[i])), []).append(i)
        idx_all = source_index(
            np.array([int(s[4:]) for s in ids], dtype=np.int64)
        )
        for (fmt, w, h), rows in groups.items():
            rows_np = np.array(rows)
            stack = decode_group_stack(blobs, rows, fmt, w, h)
            ref = synth_pixels_batch(idx_all[rows_np], w, h)
            gx = stack.sum(axis=3, dtype=np.int64) / 3.0
            gy = ref.sum(axis=3, dtype=np.int64) / 3.0
            s = ssim_windows_batch(gx, gy, self.win)
            ppm[rows_np] = np.round(s * 1e6).astype(np.int64)

        return pa.table(
            {
                "image_id": ids,
                "fmt": batch.column("fmt"),
                "ssim_ppm": pa.array(ppm),
            }
        )
