"""Audio / video multimodal stages — actor-pool map_batches over opaque
binary columns.

Per the build brief, the audio/video DECODERS are stubs (no codec libs in
this container): :func:`fake_pcm_decode` / :func:`fake_frame_decode` derive
deterministic samples/frames from the payload bytes, and the real-codec
integration point is marked. Everything Ray-side is real and tested — the
schema contract (opaque ``binary`` column + typed metadata columns), small
batch sizes for large payloads, per-actor setup in ``__init__``, zero-copy
Arrow input, and vectorized feature math over the decoded arrays — so
swapping in a real decoder changes one function, not the pipeline.

Mirrors the image path (`stages/decode.py`); the reference's analogue is
the texture/appearance byte handling in its sinks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels.imagecodec import splitmix64


def fake_pcm_decode(payload: bytes, n_samples: int, seed: int) -> np.ndarray:
    """STUB decoder: deterministic int16 PCM derived from the payload hash.
    Real integration point: replace with soundfile/ffmpeg decode."""
    base = np.frombuffer(payload[: 8 * ((len(payload)) // 8)], dtype=np.uint64)
    h = splitmix64(base ^ np.uint64(seed)) if len(base) else np.array([np.uint64(seed)])
    idx = np.arange(n_samples, dtype=np.uint64)
    vals = splitmix64(idx ^ h[idx % np.uint64(len(h))])
    return (vals % np.uint64(1 << 16)).astype(np.int64) - (1 << 15)


def fake_frame_decode(payload: bytes, n_frames: int, w: int, h: int,
                      seed: int) -> np.ndarray:
    """STUB decoder: deterministic (n_frames, h, w) uint8 luma planes.
    Real integration point: replace with pyav/ffmpeg frame extraction."""
    idx = np.arange(n_frames * h * w, dtype=np.uint64)
    key = np.uint64(seed ^ len(payload))
    vals = splitmix64(idx ^ key)
    return (vals % np.uint64(256)).astype(np.uint8).reshape(n_frames, h, w)


class AudioFeatures:
    """Per-clip features from decoded PCM: RMS energy, zero-crossing count,
    peak amplitude — vectorized per clip, batch of clips per call.

    Expects columns (clip_id:int64, payload:binary, sample_rate:int32,
    n_samples:int32); emits integer-scaled features (determinism contract).
    """

    def __init__(self, seed: int = 7):
        self.seed = seed  # per-actor setup (codec/context init goes here)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("clip_id").to_numpy()
        from .decode import binary_views

        payloads = binary_views(batch.column("payload"))
        n_samp = batch.column("n_samples").to_numpy()
        rms_q = np.empty(len(ids), dtype=np.int64)
        zero_x = np.empty(len(ids), dtype=np.int64)
        peak = np.empty(len(ids), dtype=np.int64)
        # vectorize by equal-length group (the image decoder's (fmt,w,h)
        # stack-decode pattern): decode a (k, n) PCM matrix per group and
        # reduce along axis 1
        for n in np.unique(n_samp):
            sel = np.nonzero(n_samp == n)[0]
            pcm = np.stack(
                [fake_pcm_decode(payloads[i], int(n), self.seed) for i in sel]
            ).astype(np.float64)
            rms_q[sel] = np.round(np.sqrt((pcm ** 2).mean(axis=1)) * 100).astype(np.int64)
            zero_x[sel] = (np.diff(np.signbit(pcm), axis=1) != 0).sum(axis=1)
            peak[sel] = np.abs(pcm).max(axis=1).astype(np.int64)
        return pa.table(
            {
                "clip_id": pa.array(ids),
                "rms_q": pa.array(rms_q),
                "zero_crossings": pa.array(zero_x),
                "peak": pa.array(peak),
            }
        )


class VideoFrameSample:
    """Frame sampling + per-frame mean luma: the decode/frame-sample stage.

    Expects (video_id:int64, payload:binary, w:int32, h:int32,
    n_frames:int32); samples every ``stride``-th frame and emits one row
    per sampled frame (1->N flat_map shape) with integer mean luma.
    """

    def __init__(self, stride: int = 10, seed: int = 11):
        self.stride = stride
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("video_id").to_numpy()
        from .decode import binary_views

        payloads = binary_views(batch.column("payload"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        nfs = batch.column("n_frames").to_numpy()
        parts = []
        # vectorize by (w, h, n_frames) group: stack-decode to a
        # (k, n_frames, h, w) tensor, sample + reduce along frame pixels
        key = np.stack([ws, hs, nfs], axis=1)
        for row in np.unique(key, axis=0):
            w, h, nf = (int(v) for v in row)
            sel = np.nonzero((ws == w) & (hs == h) & (nfs == nf))[0]
            planes = np.stack(
                [fake_frame_decode(payloads[i], nf, w, h, self.seed) for i in sel]
            )
            fsel = np.arange(0, nf, self.stride)
            mean_luma = planes[:, fsel].reshape(len(sel), len(fsel), -1).mean(axis=2)
            parts.append(
                pa.table(
                    {
                        "video_id": pa.array(
                            np.repeat(ids[sel], len(fsel)).astype(np.int64)
                        ),
                        "frame_idx": pa.array(
                            np.tile(fsel, len(sel)).astype(np.int64)
                        ),
                        "mean_luma_c": pa.array(
                            np.round(mean_luma * 100).astype(np.int64).reshape(-1)
                        ),
                    }
                )
            )
        return pa.concat_tables(parts) if parts else pa.table(
            {"video_id": pa.array([], pa.int64()),
             "frame_idx": pa.array([], pa.int64()),
             "mean_luma_c": pa.array([], pa.int64())}
        )


def synth_av_table(n_clips: int = 64, kind: str = "audio") -> pa.Table:
    """Deterministic synthetic AV table (binary payload + typed metadata) —
    the Lance-shaped multimodal layout from the build brief."""
    ids = np.arange(n_clips, dtype=np.int64)
    payloads = [
        splitmix64(np.arange(16, dtype=np.uint64) ^ np.uint64(i)).tobytes()
        for i in ids
    ]
    if kind == "audio":
        return pa.table(
            {
                "clip_id": pa.array(ids),
                "payload": pa.array(payloads, pa.binary()),
                "sample_rate": pa.array(np.full(n_clips, 16000, np.int32)),
                "n_samples": pa.array((1600 + (ids % 7) * 160).astype(np.int32)),
            }
        )
    return pa.table(
        {
            "video_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "w": pa.array(np.full(n_clips, 32, np.int32)),
            "h": pa.array(np.full(n_clips, 18, np.int32)),
            "n_frames": pa.array((30 + (ids % 4) * 30).astype(np.int32)),
        }
    )


def audio_features_ds(n_clips: int = 64):
    """Dataset pipeline: synthetic audio table -> AudioFeatures actor pool.
    Small batch size is deliberate: payload columns dominate batch bytes."""
    import ray.data

    ds = ray.data.from_arrow(synth_av_table(n_clips, "audio"))
    return ds.map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4),
    )


def video_frame_sample_ds(n_clips: int = 64, stride: int = 10):
    import ray.data

    ds = ray.data.from_arrow(synth_av_table(n_clips, "video"))
    return ds.map_batches(
        VideoFrameSample, fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow", batch_size=64, concurrency=(1, 4),
    )


class AudioVadSegments:
    """Energy-threshold voice-activity detection: frame the decoded PCM
    into ``frame_len``-sample windows, a window is ACTIVE when its exact
    integer energy sum(x^2) clears ``thresh_q`` * frame_len * 2^20 (a
    quantized per-sample mean-square threshold), and consecutive active
    windows merge into segments (the same gaps-and-islands run detection
    as stages/trajectory.py, vectorized across the clip stack). Output one
    row per clip: total/active window counts, segment count, longest
    segment — the speech-data curation filter a 100 TB audio pipeline
    runs before transcription. Decoder is the documented stub; everything
    Ray-side (schema, stack decode, vectorized window math) is real."""

    def __init__(self, frame_len: int = 160, thresh_q: int = 349_600,
                 seed: int = 7):
        self.frame_len = frame_len
        self.thresh_q = thresh_q
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .decode import binary_views

        ids = batch.column("clip_id").to_numpy()
        payloads = binary_views(batch.column("payload"))
        n_samp = batch.column("n_samples").to_numpy()
        n = len(ids)
        n_win = np.empty(n, dtype=np.int64)
        n_act = np.empty(n, dtype=np.int64)
        n_seg = np.empty(n, dtype=np.int64)
        seg_max = np.empty(n, dtype=np.int64)
        fl = self.frame_len
        # exact integer threshold: mean square >= thresh_q * 2^20 / 2^10
        # expressed multiplication-only (energy * 2^10 >= thresh_q *
        # 2^20 * fl) so no float division enters the decision
        for ns in np.unique(n_samp):
            sel = np.nonzero(n_samp == ns)[0]
            nw = int(ns) // fl
            pcm = np.stack(
                [fake_pcm_decode(payloads[i], int(ns), self.seed) for i in sel]
            )[:, : nw * fl]
            en = (pcm.reshape(len(sel), nw, fl).astype(np.int64) ** 2).sum(
                axis=2
            )
            act = en * (1 << 10) >= self.thresh_q * (1 << 20) * fl
            n_win[sel] = nw
            n_act[sel] = act.sum(axis=1)
            starts = act & ~np.c_[np.zeros(len(sel), bool), act[:, :-1]]
            n_seg[sel] = starts.sum(axis=1)
            # longest run via per-row reset-cumsum: position minus the
            # last inactive position, maxed over active cells
            pos = np.arange(nw)
            last_off = np.maximum.accumulate(
                np.where(~act, pos, -1), axis=1
            )
            runlen = np.where(act, pos - last_off, 0)
            seg_max[sel] = runlen.max(axis=1) if nw else 0
        return pa.table(
            {
                "clip_id": pa.array(ids),
                "n_windows": pa.array(n_win),
                "n_active": pa.array(n_act),
                "n_segments": pa.array(n_seg),
                "longest_seg": pa.array(seg_max),
            }
        )


class VideoSceneCuts:
    """Scene-cut detection: per frame, the exact integer luma SUM; a cut
    happens between consecutive frames when |luma_sum delta| exceeds
    ``thresh_permille`` per-mille of the frame's full-scale sum
    (255 * w * h) — multiplication-only integer compare, no float. Output
    one row per video: frame count, cut count, max delta (per-mille,
    truncating), mean luma of the whole clip (centi-scaled, truncating) —
    the shot-boundary pass a video curation pipeline runs before
    keyframe extraction. Stub decoder, real Ray plumbing, scalar pin."""

    def __init__(self, thresh_permille: int = 40, seed: int = 11):
        self.thresh = thresh_permille
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .decode import binary_views

        ids = batch.column("video_id").to_numpy()
        payloads = binary_views(batch.column("payload"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        nfs = batch.column("n_frames").to_numpy()
        n = len(ids)
        n_cuts = np.empty(n, dtype=np.int64)
        max_jump = np.empty(n, dtype=np.int64)
        mean_luma_c = np.empty(n, dtype=np.int64)
        key = np.stack([ws, hs, nfs], axis=1)
        for row in np.unique(key, axis=0):
            w, h, nf = (int(v) for v in row)
            sel = np.nonzero((ws == w) & (hs == h) & (nfs == nf))[0]
            planes = np.stack(
                [fake_frame_decode(payloads[i], nf, w, h, self.seed)
                 for i in sel]
            )
            fsum = planes.reshape(len(sel), nf, -1).sum(
                axis=2, dtype=np.int64
            )
            full = 255 * w * h
            d = np.abs(np.diff(fsum, axis=1))
            cuts = d * 1000 > self.thresh * full
            n_cuts[sel] = cuts.sum(axis=1)
            dmax = d.max(axis=1) if nf > 1 else np.zeros(len(sel), np.int64)
            max_jump[sel] = dmax * 1000 // full
            mean_luma_c[sel] = fsum.sum(axis=1) * 100 // (nf * w * h)
        return pa.table(
            {
                "video_id": pa.array(ids),
                "n_cuts": pa.array(n_cuts),
                "max_jump_pm": pa.array(max_jump),
                "mean_luma_c": pa.array(mean_luma_c),
            }
        )


def audio_vad_ds(n_clips: int = 64):
    import ray.data

    ds = ray.data.from_arrow(synth_av_table(n_clips, "audio"))
    return ds.map_batches(
        AudioVadSegments, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4),
    )


def video_scene_cuts_ds(n_clips: int = 64):
    import ray.data

    ds = ray.data.from_arrow(synth_av_table(n_clips, "video"))
    return ds.map_batches(
        VideoSceneCuts, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4),
    )
