"""Multimodal column stages (image/audio/video as opaque binary + typed
metadata).

The image decode path is REAL for the engine's own payload formats
(raw16/rawu8/pngz/lq8, self-describing magic — kernels/codecs.py) AND for
real PNG, (Geo)TIFF, baseline JPEG, Windows BMP and GIF bytes
(from-scratch decoders: kernels/png.py — filters, bit depths 1-16,
palette, Adam7; kernels/tiff.py — strips, deflate/LZW, predictor;
kernels/jpeg.py — Annex-K Huffman, IDCT, 4:2:0; kernels/bmp.py —
BI_RGB 8/24/32-bit DIB; kernels/gif.py — LSB-first LZW, interlace).  The audio decode path is REAL for
RIFF/WAVE bytes (kernels/wav.py — PCM 8/16/24/32-bit, IEEE float,
WAVE_FORMAT_EXTENSIBLE) and video for uncompressed-DIB AVI
(kernels/avi.py).  Remaining foreign formats (webp/mp3/ogg/mp4 —
libraries absent in this container) fall
back to a clearly marked deterministic fake / NotImplementedError behind
``DECODERS`` — the registry swap point — while the Ray-side plumbing
(schema, actor signature, batch sizing, output layout) is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),  # image | audio | video
        ("meta", pa.string()),  # JSON typed metadata
    ]
)


def _fake_image_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a JPEG/PNG decoder: hash-seeded pixels."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=4).digest(), "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(3, 32, 32), dtype=np.uint8)


def _image_decode(payload: bytes) -> np.ndarray:
    """REAL decode for the engine's native formats (self-describing magic);
    foreign payloads fall back to the deterministic fake (PIL absent).

    The fallback triggers ONLY on an unrecognized magic byte: a payload
    that claims a native format but is truncated/corrupted RAISES, so data
    corruption can never silently turn into synthetic pixels downstream."""
    from ..kernels import codecs

    if codecs.sniff(payload) is None:
        return _fake_image_decode(payload)
    try:
        return codecs.decode(payload)
    except Exception as exc:
        raise ValueError(
            f"native-format image payload is malformed: {exc}"
        ) from exc


def _unavailable(kind: str):
    def fn(payload: bytes):
        raise NotImplementedError(
            f"{kind} decoding requires codec libraries not present in this "
            "environment; register a real decoder in multimodal.DECODERS"
        )

    return fn


def _audio_decode(payload: bytes) -> np.ndarray:
    """REAL decode for RIFF/WAVE bytes (from-scratch kernels/wav.py —
    PCM 8/16/24/32, IEEE float, extensible); non-WAV audio (mp3/ogg/...)
    raises NotImplementedError (decoder libs absent), same contract as
    foreign image formats."""
    from ..kernels import wav

    if not wav.is_wav(payload):
        _unavailable("non-WAV audio")(payload)
    samples, _rate = wav.decode_wav(payload)
    return samples


def _video_decode(payload: bytes) -> np.ndarray:
    """REAL decode for uncompressed-DIB AVI bytes (from-scratch
    kernels/avi.py); returns the representative FIRST frame (bands, h, w)
    so the generic feature extractor applies — frame-level access goes
    through frame_sample_stage / kernels.avi.decode_avi directly.
    Non-AVI video (mp4/webm/...) raises NotImplementedError."""
    from ..kernels import avi

    if not avi.is_avi(payload):
        _unavailable("non-AVI video")(payload)
    frames, _fps = avi.decode_avi(payload)
    return frames[0]


DECODERS = {
    "image": _image_decode,  # native formats real; foreign -> fake (PIL absent)
    "audio": _audio_decode,  # WAV real (kernels/wav.py); others raise
    "video": _video_decode,  # uncompressed AVI real (kernels/avi.py)
}


class FeatureExtractor:
    """Actor-pool decode + feature stage.

    __init__ loads the (stubbed) decoder + projection matrix once per actor;
    __call__ decodes each payload, pools to a fixed-length feature vector.
    Batch size stays small because payloads are large binaries (brief:
    'large binary payloads need small batches').
    """

    def __init__(
        self, feature_dim: int = 16, seed: int = 5, projection: str = "gaussian"
    ):
        self.decoders = DECODERS
        self.projection = projection
        if projection == "gaussian":
            rng = np.random.default_rng(seed)
            self.proj = rng.standard_normal((3 * 32 * 32, feature_dim))
        elif projection == "pooled":
            # per-channel [sum, min, max] over the standardized array —
            # a deterministic pooled-statistics embedding (feature_dim 9).
            self.proj = None
        else:
            raise ValueError(f"unknown projection {projection!r}")

    @staticmethod
    def _standardize(arr: np.ndarray) -> np.ndarray:
        """Any (bands, h, w) decode -> (3, 32, 32) float: nearest-gather
        resize + channel cycling, so native decodes of arbitrary shape and
        the 3x32x32 fake share one projection."""
        if arr.ndim == 2:
            arr = arr[None]
        b, h, w = arr.shape
        ri = (np.arange(32) * h // 32).astype(np.int64)
        ci = (np.arange(32) * w // 32).astype(np.int64)
        small = arr[:, ri[:, None], ci[None, :]].astype(np.float64)
        return small[np.arange(3) % b]

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload, mtype in zip(
            batch["payload"].to_pylist(), batch["media_type"].to_pylist()
        ):
            arr = self._standardize(self.decoders[mtype](payload))
            if self.projection == "pooled":
                feats.append(
                    np.stack(
                        [arr.sum(axis=(1, 2)), arr.min(axis=(1, 2)),
                         arr.max(axis=(1, 2))], axis=1
                    ).reshape(-1).tolist()
                )
            else:
                feats.append((arr.reshape(-1) @ self.proj).tolist())
        return pa.Table.from_pydict(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "feature": pa.array(feats, pa.list_(pa.float64())),
            }
        )


def feature_stage(
    ds,
    feature_dim: int = 16,
    concurrency=(1, 2),
    batch_size: int = 64,
    projection: str = "gaussian",
):
    return ds.map_batches(
        FeatureExtractor,
        fn_constructor_kwargs=dict(feature_dim=feature_dim, projection=projection),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )


class Resizer:
    """Decode -> nearest-neighbor resize -> re-encode as raw bytes.

    The resize math itself is real numpy (index-gather); only the media
    decode is the stubbed boundary.  Output rows carry the resized raw
    payload + its shape metadata.
    """

    def __init__(self, out_h: int = 16, out_w: int = 16):
        self.decoders = DECODERS
        self.out_h = out_h
        self.out_w = out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, shapes = [], []
        for payload, mtype in zip(
            batch["payload"].to_pylist(), batch["media_type"].to_pylist()
        ):
            arr = self.decoders[mtype](payload)
            _, h, w = arr.shape
            ri = (np.arange(self.out_h) * h // self.out_h).astype(np.int64)
            ci = (np.arange(self.out_w) * w // self.out_w).astype(np.int64)
            resized = arr[:, ri[:, None], ci[None, :]]
            payloads.append(resized.tobytes())
            shapes.append([arr.shape[0], self.out_h, self.out_w])
        return pa.Table.from_pydict(
            {
                "media_id": batch["media_id"].to_pylist(),
                "payload": pa.array(payloads, pa.binary()),
                "shape": pa.array(shapes, pa.list_(pa.int32())),
            }
        )


def resize_stage(ds, out_h: int = 16, out_w: int = 16, concurrency=(1, 2),
                 batch_size: int = 64):
    return ds.map_batches(
        Resizer,
        fn_constructor_kwargs=dict(out_h=out_h, out_w=out_w),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )


def frame_sample_stage(ds, every_nth: int = 10, concurrency=(1, 2)):
    """Video frame sampling: one output row per sampled frame (flat-map
    shape).  AVI payloads decode for REAL (kernels/avi.py) and each
    sampled row carries the frame's pixel checksum; foreign video formats
    fall back to the metadata-declared frame count with a null checksum
    (the fan-out contract stays testable either way)."""
    import json

    from ..kernels import avi

    def sample(batch: pa.Table) -> pa.Table:
        ids, fidx, sums = [], [], []
        for media_id, payload, meta in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["meta"].to_pylist(),
        ):
            if payload and avi.is_avi(payload):
                frames, _fps = avi.decode_avi(payload)
                for f in range(0, len(frames), every_nth):
                    ids.append(media_id)
                    fidx.append(f)
                    sums.append(int(frames[f].astype(np.int64).sum()))
            else:
                n_frames = int(json.loads(meta or "{}").get("n_frames", 0))
                for f in range(0, n_frames, every_nth):
                    ids.append(media_id)
                    fidx.append(f)
                    sums.append(None)
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_index": pa.array(fidx, pa.int32()),
                "frame_sum": pa.array(sums, pa.int64()),
            }
        )

    return ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


def ahash64(arr: np.ndarray) -> np.int64:
    """8x8 average hash (aHash) of a decoded (bands, h, w) image —
    the classic perceptual fingerprint for image near-dup detection.

    Integer-exact so a SQL oracle can mirror it bit-for-bit: grayscale =
    SUM over bands (no float luma weights), block edges r_k = k*h//8
    (any h, w >= 8), and bit(br, bc) = 1 iff the block mean STRICTLY
    exceeds the image mean, compared by integer cross-multiplication
    (block_sum * total_area > total_sum * block_area) — no division, no
    float rounding.  Bit k = br*8 + bc; returned as the signed int64
    view of the uint64 hash (Arrow-friendly, same convention as SimHash).
    """
    b, h, w = arr.shape
    if h < 8 or w < 8:
        raise ValueError(f"ahash64 needs h, w >= 8, got {h}x{w}")
    if h * w > 1 << 26:
        raise ValueError(
            f"ahash64 int64 cross-multiplication bound exceeded for "
            f"{h}x{w}; downsample first (resize_stage)"
        )
    gray = arr.astype(np.int64).sum(axis=0)
    p = np.zeros((h + 1, w + 1), np.int64)
    np.cumsum(np.cumsum(gray, axis=0), axis=1, out=p[1:, 1:])
    re = (np.arange(9) * h) // 8
    ce = (np.arange(9) * w) // 8
    ps = p[re][:, ce]  # (9, 9) prefix sums at block corners
    block_sum = ps[1:, 1:] - ps[:-1, 1:] - ps[1:, :-1] + ps[:-1, :-1]
    block_area = np.outer(np.diff(re), np.diff(ce)).astype(np.int64)
    total_sum = int(p[h, w])
    bits = block_sum * (h * w) > total_sum * block_area
    k = (np.arange(8)[:, None] * 8 + np.arange(8)[None, :]).astype(np.uint64)
    hash_u = np.bitwise_or.reduce(
        (bits.astype(np.uint64) << k).ravel()
    )
    return hash_u.view(np.int64)


class AHasher:
    """Actor-pool perceptual-hash stage: decode (REAL for every native +
    wild format in the codec registry) -> 64-bit aHash per image.  Decoder
    table pinned in __init__; output is the slim (id, ahash) relation so
    downstream LSH shuffles never carry pixels."""

    def __init__(self, id_col: str = "media_id"):
        self.decode = DECODERS["image"]
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = [
            int(ahash64(self.decode(payload)))
            for payload in batch["payload"].to_pylist()
        ]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "ahash": pa.array(hashes, pa.int64()),
            }
        )


def ahash_stage(ds, id_col: str = "media_id", concurrency=(1, 2),
                batch_size: int = 64):
    return ds.map_batches(
        AHasher,
        fn_constructor_kwargs=dict(id_col=id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )


def image_near_dup(ds, id_col: str = "media_id", max_hamming: int = 3,
                   bands: int = 4, concurrency=(1, 2)):
    """Image near-duplicate candidate pairs: aHash in an actor pool, then
    the certified banded hamming-LSH plan (functions/dedup.py) over the
    slim (id, ahash) relation — by pigeonhole every pair within
    ``bands - 1`` hamming is caught, and emitted pairs carry exact
    hamming.  100-TB shape: pixels never leave the decode actors; the
    LSH shuffle moves 16 bytes per image per band."""
    from .dedup import banded_hamming_candidates

    hashed = ahash_stage(ds, id_col=id_col, concurrency=concurrency)
    return banded_hamming_candidates(
        hashed, id_col=id_col, hash_col="ahash",
        max_hamming=max_hamming, bands=bands,
    )


def audio_features_stage(ds, frame: int = 256, hop: int = 128,
                         quantize: bool = True, concurrency=(1, 2)):
    """Frame-level audio features over decoded waveforms: per
    (media, channel, frame) — ``energy`` (sum of squares), ``peak``
    (max magnitude) and ``zero_crossings`` (strict sign flips between
    consecutive samples; zeros never cross) — the front half of any
    VAD / silence-trim / audio-quality filter in a training-data
    pipeline.

    ``quantize=True`` (default) casts decoded samples to int64 so every
    feature is integer-exact and order-free (PCM decodes are integral;
    float audio truncates toward zero, documented).  ``quantize=False``
    keeps float64 features for real-valued audio.

    Overflow contract: int64 energy holds |x| <= ~600k per 256-sample
    frame; full-scale 32-bit PCM needs ``quantize=False``.

    100-TB shape: embarrassingly parallel map_batches (flat-map to frame
    rows); payload bytes never re-enter the object store — only the slim
    (id, channel, frame, 3 ints) relation leaves the stage.
    """
    def run(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {
            "media_id": [], "channel": [], "frame_index": [],
            "energy": [], "zero_crossings": [], "peak": [],
        }
        for media_id, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            samples = DECODERS["audio"](payload)
            x = np.asarray(samples)
            if x.ndim == 1:
                x = x[None, :]
            if quantize:
                x = x.astype(np.int64)
            else:
                x = x.astype(np.float64)
            n = x.shape[1]
            if n < frame:
                continue
            n_frames = 1 + (n - frame) // hop
            for ch in range(x.shape[0]):
                w = np.lib.stride_tricks.sliding_window_view(
                    x[ch], frame
                )[:: hop][:n_frames]
                energy = (w * w).sum(axis=1)
                pos = w > 0
                neg = w < 0
                zc = (
                    (pos[:, :-1] & neg[:, 1:]) | (neg[:, :-1] & pos[:, 1:])
                ).sum(axis=1)
                peak = np.abs(w).max(axis=1)
                for f in range(n_frames):
                    out["media_id"].append(media_id)
                    out["channel"].append(ch)
                    out["frame_index"].append(f)
                    out["energy"].append(energy[f])
                    out["zero_crossings"].append(int(zc[f]))
                    out["peak"].append(peak[f])
        val_t = pa.int64() if quantize else pa.float64()
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.string()),
                "channel": pa.array(out["channel"], pa.int32()),
                "frame_index": pa.array(out["frame_index"], pa.int32()),
                "energy": pa.array(out["energy"], val_t),
                "zero_crossings": pa.array(out["zero_crossings"], pa.int64()),
                "peak": pa.array(out["peak"], val_t),
            }
        )

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)


def scene_cut_stage(ds, threshold: int = 400, concurrency=(1, 2)):
    """Shot-boundary (scene-cut) detection over decoded video: for every
    consecutive frame pair, the sum of absolute pixel differences (SAD,
    integer-exact); ``is_cut`` = 1 where SAD exceeds ``threshold`` — the
    keyframe-selection primitive of a video training-data pipeline
    (sample one frame per shot instead of a fixed stride).

    AVI payloads decode for REAL (kernels/avi.py); foreign formats raise
    the same NotImplementedError contract as DECODERS['video'].

    100-TB shape: embarrassingly parallel; only (id, frame, sad, is_cut)
    rows leave the stage.
    """
    from ..kernels import avi

    def run(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {
            "media_id": [], "frame_index": [], "sad": [], "is_cut": [],
        }
        for media_id, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            if not (payload and avi.is_avi(payload)):
                _unavailable("non-AVI video")(payload)
            frames, _fps = avi.decode_avi(payload)
            a = np.asarray(frames).astype(np.int64)
            if a.shape[0] < 2:
                continue
            sad = np.abs(a[1:] - a[:-1]).sum(axis=tuple(range(1, a.ndim)))
            for t, s in enumerate(sad.tolist(), start=1):
                out["media_id"].append(media_id)
                out["frame_index"].append(t)
                out["sad"].append(s)
                out["is_cut"].append(1 if s > threshold else 0)
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.string()),
                "frame_index": pa.array(out["frame_index"], pa.int32()),
                "sad": pa.array(out["sad"], pa.int64()),
                "is_cut": pa.array(out["is_cut"], pa.int64()),
            }
        )

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)


AUGMENT_OPS = ("hflip", "vflip", "rot90")


def augment_tile(pixels: np.ndarray, op: str) -> np.ndarray:
    """Deterministic spatial augmentation of a (bands, h, w) array:
    horizontal / vertical mirror, or 90-degree CLOCKWISE rotation
    (new[r', c'] = old[h-1-c', r'] — i.e. old (r, c) lands at
    (c, h-1-r))."""
    if op == "hflip":
        return pixels[:, :, ::-1]
    if op == "vflip":
        return pixels[:, ::-1, :]
    if op == "rot90":
        return np.rot90(pixels, k=-1, axes=(1, 2))
    raise ValueError(f"unknown augment op {op!r} (one of {AUGMENT_OPS})")


def augment_stage(tiles_ds, ops=AUGMENT_OPS, **map_kwargs):
    """Training-data image augmentation: emit one transformed copy of
    every tile per op (the standard vision-pipeline flip/rotate set;
    deterministic, not sampled — samplers compose via weighted_sample
    upstream).  Pixels AND nodata move together (the validity mask is
    re-derived from the transformed array downstream), so augmented
    tiles chain into any pixel stage.

    Geo note: mirrored/rotated rasters are ML tensors, not georeferenced
    scenes — the affine transform is intentionally NOT emitted (the
    reference's georeferencing contract cannot survive a mirror).

    100-TB shape: pure flat-map, output = len(ops) x input, streams.
    """
    from ..stages.schema import pixel_views, pixels_to_bytes

    ops = tuple(ops)
    for op in ops:
        if op not in AUGMENT_OPS:
            raise ValueError(f"unknown augment op {op!r}")

    def run(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {
            k: []
            for k in ("image_id", "tile_row", "tile_col", "band_count",
                      "h", "w", "dtype", "nodata", "op", "pixels")
        }
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, pixels in zip(meta, pixel_views(batch)):
            for op in ops:
                aug = augment_tile(pixels, op)
                out["image_id"].append(row["image_id"])
                out["tile_row"].append(row["tile_row"])
                out["tile_col"].append(row["tile_col"])
                out["band_count"].append(aug.shape[0])
                out["h"].append(aug.shape[1])
                out["w"].append(aug.shape[2])
                out["dtype"].append(row["dtype"])
                out["nodata"].append(row["nodata"])
                out["op"].append(op)
                out["pixels"].append(pixels_to_bytes(aug))
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "tile_row": pa.array(out["tile_row"], pa.int32()),
                "tile_col": pa.array(out["tile_col"], pa.int32()),
                "band_count": pa.array(out["band_count"], pa.int32()),
                "h": pa.array(out["h"], pa.int32()),
                "w": pa.array(out["w"], pa.int32()),
                "dtype": pa.array(out["dtype"], pa.string()),
                "nodata": pa.array(out["nodata"], pa.float64()),
                "op": pa.array(out["op"], pa.string()),
                "pixels": pa.array(out["pixels"], pa.binary()),
            }
        )

    return tiles_ds.map_batches(run, batch_format="pyarrow",
                                zero_copy_batch=True, **map_kwargs)


def patchify_stage(tiles_ds, patch: int = 16, **map_kwargs):
    """ViT-style patch extraction: split every tile into non-overlapping
    ``patch`` x ``patch`` patches and emit, per (tile, band, patch):
    the flattened patch values (the model-input token) plus the integer
    moment statistics (n_valid, sum, sum of squares, min, max) that a
    normalization pass needs — computed over VALID pixels only.

    Zero-shuffle for the same reason as overviews_stage: the 64-cut
    tile grid divides the patch size, so per-tile patches ARE per-image
    patches; misaligned tiles raise.  All-nodata patches are skipped.

    100-TB shape: flat-map; the stats relation is ~(hw/patch^2) rows per
    tile and the payload column equals input volume — both stream.
    """
    from ..kernels.nodata import valid_mask
    from ..stages.schema import pixel_views

    def run(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {
            k: []
            for k in ("image_id", "tile_row", "tile_col", "band",
                      "patch_row", "patch_col", "n_valid", "psum",
                      "psumsq", "pmin", "pmax", "values")
        }
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, pixels in zip(meta, pixel_views(batch)):
            h, w = pixels.shape[1], pixels.shape[2]
            if h % patch or w % patch:
                raise ValueError(
                    f"patch {patch} does not divide tile {h}x{w} of "
                    f"{row['image_id']} — cut tiles at a multiple"
                )
            nod = row["nodata"]
            if nod != nod:
                nod = (
                    None if np.dtype(row["dtype"]).kind in "iu"
                    else float("nan")
                )
            vm = valid_mask(pixels, nod)
            ph, pw = h // patch, w // patch
            v = pixels.astype(np.int64)
            vz = np.where(vm, v, 0)
            blk = vz.reshape(-1, ph, patch, pw, patch)
            mblk = vm.reshape(-1, ph, patch, pw, patch)
            n = mblk.sum(axis=(2, 4))
            s = blk.sum(axis=(2, 4))
            s2 = (blk * blk).sum(axis=(2, 4))
            big = np.iinfo(np.int64).max
            vmin = np.where(mblk, v.reshape(blk.shape), big).min(axis=(2, 4))
            vmax = np.where(mblk, v.reshape(blk.shape), -big).max(axis=(2, 4))
            for b in range(pixels.shape[0]):
                prr, pcc = np.nonzero(n[b])
                for pr, pc_ in zip(prr.tolist(), pcc.tolist()):
                    out["image_id"].append(row["image_id"])
                    out["tile_row"].append(row["tile_row"])
                    out["tile_col"].append(row["tile_col"])
                    out["band"].append(b)
                    out["patch_row"].append(pr)
                    out["patch_col"].append(pc_)
                    out["n_valid"].append(int(n[b, pr, pc_]))
                    out["psum"].append(int(s[b, pr, pc_]))
                    out["psumsq"].append(int(s2[b, pr, pc_]))
                    out["pmin"].append(int(vmin[b, pr, pc_]))
                    out["pmax"].append(int(vmax[b, pr, pc_]))
                    out["values"].append(
                        v[b,
                          pr * patch : (pr + 1) * patch,
                          pc_ * patch : (pc_ + 1) * patch].ravel()
                    )
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "tile_row": pa.array(out["tile_row"], pa.int32()),
                "tile_col": pa.array(out["tile_col"], pa.int32()),
                "band": pa.array(out["band"], pa.int32()),
                "patch_row": pa.array(out["patch_row"], pa.int32()),
                "patch_col": pa.array(out["patch_col"], pa.int32()),
                "n_valid": pa.array(out["n_valid"], pa.int64()),
                "psum": pa.array(out["psum"], pa.int64()),
                "psumsq": pa.array(out["psumsq"], pa.int64()),
                "pmin": pa.array(out["pmin"], pa.int64()),
                "pmax": pa.array(out["pmax"], pa.int64()),
                "values": pa.array(out["values"], pa.list_(pa.int64())),
            }
        )

    return tiles_ds.map_batches(run, batch_format="pyarrow",
                                zero_copy_batch=True, **map_kwargs)


_PHASH_SCALE = 1 << 14


def phash_dct_matrix() -> np.ndarray:
    """Integerized 16-point DCT-II basis: T[u, j] = round(2^14 * c_u *
    cos(pi*(2j+1)u/32)), c_0 = sqrt(1/16), else sqrt(2/16).  The
    literals are the SHARED CONSTANTS of the pHash contract — the SQL
    oracle inlines exactly these integers (like JPEG's integer DCT, the
    quantized basis IS the spec; no transcendental functions at query
    time on either side)."""
    j = np.arange(16, dtype=np.float64)[None, :]
    u = np.arange(16, dtype=np.float64)[:, None]
    c = np.where(u == 0, np.sqrt(1.0 / 16.0), np.sqrt(2.0 / 16.0))
    return np.rint(
        _PHASH_SCALE * c * np.cos(np.pi * (2 * j + 1) * u / 32.0)
    ).astype(np.int64)


_PHASH_T = phash_dct_matrix()


def phash64(arr: np.ndarray) -> np.int64:
    """64-bit pHash (DCT perceptual hash, the imagehash/imagededup
    standard) of a decoded (bands, 16, 16) image, INTEGER-EXACT:

    grayscale = integer band sum; C = T @ gray @ T.T with the
    integerized DCT basis (phash_dct_matrix); bits = the 8x8 low-
    frequency block compared to the LOWER MEDIAN of its 63 non-DC
    coefficients (sorted index 31 — deterministic, no float mean);
    bit k = u*8 + v, strictly-greater rule.  Images of other sizes
    resize to 16x16 first (resize_stage's nearest gather).
    """
    b, h, w = arr.shape
    if (h, w) != (16, 16):
        raise ValueError(f"phash64 needs a 16x16 image, got {h}x{w}")
    gray = arr.astype(np.int64).sum(axis=0)
    coef = _PHASH_T @ gray @ _PHASH_T.T
    low = coef[:8, :8]
    ac = np.sort(np.delete(low.ravel(), 0))
    med = int(ac[31])
    bits = (low.ravel() > med).astype(np.uint64)
    k = np.arange(64, dtype=np.uint64)
    return np.bitwise_or.reduce(bits << k).view(np.int64)


class PHasher:
    """Actor-pool pHash stage (decode table pinned in __init__, same
    shape as AHasher); output = the slim (id, phash) relation."""

    def __init__(self, id_col: str = "media_id",
                 payload_col: str = "payload"):
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels import codecs

        hashes = []
        for payload in batch[self.payload_col].to_pylist():
            arr = codecs.decode(payload)
            hashes.append(int(phash64(arr)))
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "phash64": pa.array(hashes, pa.int64()),
            }
        )


def phash_stage(media_ds, id_col: str = "media_id",
                payload_col: str = "payload", concurrency=(1, 4),
                **map_kwargs):
    """Decode -> 64-bit pHash per image (see PHasher)."""
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return media_ds.map_batches(
        PHasher,
        fn_constructor_kwargs=dict(id_col=id_col, payload_col=payload_col),
        concurrency=concurrency,
        **kwargs,
    )


def verify_mse_pairs(pairs_ds, media_ds, id_col: str = "media_id",
                     payload_col: str = "payload", a_col: str = "doc_a",
                     b_col: str = "doc_b", num_partitions: int = 8):
    """EXACT pixel-space verification of image near-dup candidates — the
    image analogue of ``dedup.verify_jaccard_pairs``: candidate pairs
    (from aHash/pHash banded LSH) re-join the media table twice and each
    pair's images are decoded and compared by INTEGER MSE numerators
    (``mse_num`` = sum over band-summed pixels of the squared
    difference, ``n_px`` = pixel count; consumers threshold
    mse_num/n_px, or convert to PSNR downstream — kernels/psnr).

    Shape: decode runs ONCE PER IMAGE on the join sides (the joined
    relation carries band-summed int64 pixel bytes — Ray's join accepts
    binary non-key fields; an unmatchable (-1) sentinel keeps every
    join stage non-empty, see cluster.hyperplane_lsh_near_dup), so the
    candidate fan-out never multiplies codec work.  Same-geometry
    images are the contract; mismatched pixel counts raise.
    """
    import ray.data as rd

    from ..kernels import codecs

    sentinel = rd.from_arrow(
        pa.table({a_col: pa.array([-1], pa.int64()),
                  b_col: pa.array([-1], pa.int64())})
    )

    def as_pairs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                a_col: pc.cast(batch[a_col], pa.int64()),
                b_col: pc.cast(batch[b_col], pa.int64()),
            }
        )

    pairs = pairs_ds.map_batches(
        as_pairs, batch_format="pyarrow", zero_copy_batch=True
    ).union(sentinel).repartition(num_partitions)

    def side(name):
        # decode ONCE PER IMAGE here (not once per pair after the join):
        # the joined relation carries band-summed int64 pixel bytes, so
        # verify() is a pure numpy diff — candidate fan-out never
        # multiplies codec work
        def ren(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {name: pa.array([], pa.int64()),
                     f"px_{name}": pa.array([], pa.binary())}
                )
            ids = (batch[id_col].to_numpy(zero_copy_only=False)
                   .astype(np.int64))
            grays = [
                codecs.decode(p).astype(np.int64).sum(axis=0)
                .astype("<i8").tobytes()
                for p in batch[payload_col].to_pylist()
            ]
            return pa.table(
                {name: pa.array(ids, pa.int64()),
                 f"px_{name}": pa.array(grays, pa.binary())}
            )

        return ren

    def _side_sentinel(name):
        # ONE id=-1 row per side, unioned once — NOT appended per batch,
        # which would let the single (-1, -1) pair sentinel cross-join
        # all A-side sentinels x all B-side sentinels (O(batches^2) rows
        # in one hash partition at corpus scale)
        return rd.from_arrow(
            pa.table({name: pa.array([-1], pa.int64()),
                      f"px_{name}": pa.array([b""], pa.binary())})
        )

    ea = media_ds.map_batches(side(a_col), batch_format="pyarrow",
                              zero_copy_batch=True).union(
        _side_sentinel(a_col)).repartition(num_partitions)
    eb = media_ds.map_batches(side(b_col), batch_format="pyarrow",
                              zero_copy_batch=True).union(
        _side_sentinel(b_col)).repartition(num_partitions)
    joined = (
        pairs.join(ea, "inner", num_partitions, on=(a_col,))
        .repartition(num_partitions)
        .join(eb, "inner", num_partitions, on=(b_col,))
    )

    def verify(batch: pa.Table) -> pa.Table:
        out = {a_col: [], b_col: [], "mse_num": [], "n_px": []}
        if batch.num_rows:
            da = batch[a_col].to_numpy(zero_copy_only=False)
            db = batch[b_col].to_numpy(zero_copy_only=False)
            pla = batch[f"px_{a_col}"].to_pylist()
            plb = batch[f"px_{b_col}"].to_pylist()
            for i in range(batch.num_rows):
                if da[i] < 0:  # join sentinel
                    continue
                ga = np.frombuffer(pla[i], dtype="<i8")
                gb = np.frombuffer(plb[i], dtype="<i8")
                if ga.size != gb.size:
                    raise ValueError(
                        f"pair ({da[i]}, {db[i]}) pixel counts differ: "
                        f"{ga.size} vs {gb.size}"
                    )
                out[a_col].append(int(da[i]))
                out[b_col].append(int(db[i]))
                out["mse_num"].append(int(((ga - gb) ** 2).sum()))
                out["n_px"].append(int(ga.size))
        return pa.table(
            {
                a_col: pa.array(out[a_col], pa.int64()),
                b_col: pa.array(out[b_col], pa.int64()),
                "mse_num": pa.array(out["mse_num"], pa.int64()),
                "n_px": pa.array(out["n_px"], pa.int64()),
            }
        )

    # spread the per-pair double-decode across the cluster: the join
    # emits few blocks, a repartition turns the decode into wide tasks
    return joined.repartition(4 * num_partitions).map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True
    )
