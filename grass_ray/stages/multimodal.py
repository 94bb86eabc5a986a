"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages.  Real decoders where the environment allows:
WAV/PCM audio via the stdlib ``wave`` module (always available) and
images via PIL when importable (soft dependency); other codecs
(mp3/ogg, video) need libraries NOT in this container, so those
kernels are STUBBED — either a clearly-marked ``NotImplementedError``
(``fake=False``) or a deterministic fake decode (``fake=True``) that
produces stable pseudo-pixels from the payload bytes.  Everything
Ray-side — schema, batch sizing for large payloads, actor signature,
output layout — is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),  # image | audio | video
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


def synth_media(n: int, media_type: str = "image", payload_bytes: int = 4096, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.bytes(payload_bytes) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array([f"m{i:06d}" for i in range(n)]),
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array([media_type] * n),
            "width": pa.array([64] * n, type=pa.int32()),
            "height": pa.array([64] * n, type=pa.int32()),
            "sample_rate": pa.array([16000] * n, type=pa.int32()),
            "n_frames": pa.array([max(1, payload_bytes // 1024)] * n, type=pa.int32()),
        }
    )


def synth_wav(
    n_samples: int = 1600,
    rate: int = 16000,
    freq: float = 440.0,
    channels: int = 1,
) -> bytes:
    """Real PCM16 WAV bytes (stdlib ``wave`` writer) — a sine tone; for
    decode tests and fixtures, deterministic."""
    import io
    import wave

    t = np.arange(n_samples, dtype=np.float64) / rate
    sig = np.rint(np.sin(2 * np.pi * freq * t) * 32000).astype("<i2")
    if channels > 1:
        sig = np.repeat(sig, channels)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(sig.tobytes())
    return buf.getvalue()


def synth_wav_lcg(n_samples: int, seed: int, rate: int = 8000) -> bytes:
    """PCM16 WAV whose samples are a pure-INTEGER LCG sequence,
    ``x_k = ((1103515245·(k + 7919·seed) + 12345) mod 65536) − 32768``
    — no transcendentals, so a SQL oracle replays the signal exactly
    with BIGINT arithmetic (generate_series) and the decoded features
    (duration / RMS / zero-crossings) are bit-equal: sums of squares
    stay exact integers and IEEE division/sqrt are correctly rounded.
    The exact-twin fixture generator for the audio path."""
    import io
    import wave

    k = np.arange(n_samples, dtype=np.int64)
    x = ((1103515245 * (k + 7919 * int(seed)) + 12345) % 65536) - 32768
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.astype("<i2").tobytes())
    return buf.getvalue()


def audio_features(ds):
    """Decoded audio (``samples`` list<int32> + ``sample_rate``) →
    per-clip duration_s / RMS / zero-crossing rate, one vectorized
    reduceat pass over the flattened sample stream per batch."""

    def kernel(batch: pa.Table) -> pa.Table:
        col = batch.column("samples")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = col.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        x = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        rate = batch.column("sample_rate").to_numpy(zero_copy_only=False)
        has = lens > 0
        rms = np.zeros(len(lens))
        zcr = np.zeros(len(lens))
        if len(x) and has.any():
            sq = np.add.reduceat(x * x, starts[has])
            rms[has] = np.sqrt(sq / lens[has])
            # sign changes between adjacent samples of the SAME clip
            c = np.zeros(len(x))
            if len(x) > 1:
                row_of = np.repeat(
                    np.arange(len(lens), dtype=np.int64), lens
                )
                c[1:] = (x[1:] * x[:-1] < 0) & (row_of[1:] == row_of[:-1])
            zcr[has] = np.add.reduceat(c, starts[has]) / lens[has]
        dur = np.where(rate > 0, lens / np.maximum(rate, 1), 0.0)
        t = batch.select(
            [c for c in ("media_id", "sample_rate", "n_frames") if c in batch.column_names]
        )
        t = t.append_column("duration_s", pa.array(dur, type=pa.float64()))
        t = t.append_column("rms", pa.array(rms, type=pa.float64()))
        t = t.append_column("zcr", pa.array(zcr, type=pa.float64()))
        return t

    return ds.map_batches(kernel, batch_format="pyarrow")


class DecodeMedia:
    """payload -> decoded array.

    fake=True: deterministic pseudo-decode (bytes -> uint8 array of the
    declared shape, repeated/truncated) so downstream stages are
    testable without media libraries.  fake=False: a REAL image decode
    via PIL when it is importable (soft dependency, loaded once per
    actor — grayscale uint8, actual width/height written back);
    raises NotImplementedError when no decoder library exists in the
    environment.
    """

    def __init__(self, fake: bool = True):
        self.fake = fake
        self._pil = None
        if not fake:
            try:
                from PIL import Image  # soft dep: not in every container

                self._pil = Image
            except ImportError:
                self._pil = None

    def _real_decode(self, batch: pa.Table) -> pa.Table:
        import io

        Image = self._pil
        payloads = batch.column("payload").to_pylist()
        out, widths, heights = [], [], []
        for p in payloads:
            img = Image.open(io.BytesIO(p)).convert("L")
            arr = np.asarray(img, dtype=np.uint8)
            heights.append(arr.shape[0])
            widths.append(arr.shape[1])
            out.append(arr.ravel())
        flat = np.concatenate(out) if out else np.empty(0, dtype=np.uint8)
        lens = np.array([len(o) for o in out], dtype=np.int64)
        offsets = pa.array(np.concatenate([[0], np.cumsum(lens)]).astype(np.int32))
        pixels = pa.ListArray.from_arrays(offsets, pa.array(flat, type=pa.uint8()))
        t = batch.set_column(
            batch.column_names.index("width"),
            "width",
            pa.array(widths, type=pa.int32()),
        )
        t = t.set_column(
            t.column_names.index("height"),
            "height",
            pa.array(heights, type=pa.int32()),
        )
        return t.append_column("pixels", pixels)

    def _real_decode_audio(self, batch: pa.Table) -> pa.Table:
        """REAL WAV/PCM decode via the stdlib ``wave`` module (always
        available — no soft dependency): per payload, parse the header,
        read the frames, mix channels to mono int32, and write the
        actual sample_rate / n_frames back.  Non-WAV audio codecs
        (mp3/ogg/flac) still need an external library and raise."""
        import io
        import wave

        payloads = batch.column("payload").to_pylist()
        outs, rates, nframes = [], [], []
        for p in payloads:
            with wave.open(io.BytesIO(p), "rb") as w:
                nch = w.getnchannels()
                sw = w.getsampwidth()
                rate = w.getframerate()
                raw = w.readframes(w.getnframes())
            dt = {1: np.uint8, 2: "<i2", 4: "<i4"}.get(sw)
            if dt is None:
                raise NotImplementedError(f"WAV sample width {sw}")
            arr = np.frombuffer(raw, dtype=dt).astype(np.int32)
            if sw == 1:
                arr = arr - 128  # 8-bit PCM is offset-binary
            if nch > 1:
                arr = (
                    arr[: len(arr) - len(arr) % nch]
                    .reshape(-1, nch)
                    .mean(axis=1)
                    .astype(np.int32)
                )
            outs.append(arr)
            rates.append(rate)
            nframes.append(len(arr))
        flat = (
            np.concatenate(outs) if outs else np.empty(0, dtype=np.int32)
        )
        lens = np.array([len(o) for o in outs], dtype=np.int64)
        offsets = pa.array(
            np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        )
        samples = pa.ListArray.from_arrays(
            offsets, pa.array(flat, type=pa.int32())
        )
        t = batch.set_column(
            batch.column_names.index("sample_rate"),
            "sample_rate",
            pa.array(rates, type=pa.int32()),
        )
        t = t.set_column(
            t.column_names.index("n_frames"),
            "n_frames",
            pa.array(nframes, type=pa.int32()),
        )
        return t.append_column("samples", samples)

    def _dispatch_real(self, batch: pa.Table, kind: str) -> pa.Table:
        if kind == "audio":
            return self._real_decode_audio(batch)
        if kind == "image" and self._pil is not None:
            return self._real_decode(batch)
        raise NotImplementedError(
            f"real decode for media_type {kind!r}: WAV audio uses the "
            "stdlib wave module; images need PIL (absent here unless "
            "installed); video needs pyav — not available in this "
            "container; run with fake=True for the plumbing"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            import pyarrow.compute as pc

            if batch.num_rows == 0:
                # no rows to decode; non-empty blocks settle the schema
                return batch
            kinds = sorted(set(batch.column("media_type").to_pylist()))
            if len(kinds) == 1:
                return self._dispatch_real(batch, kinds[0])
            # mixed batch: decode each media type with its own decoder;
            # type-specific output columns (samples/pixels) null-fill
            parts = [
                self._dispatch_real(
                    batch.filter(pc.equal(batch.column("media_type"), k)), k
                )
                for k in kinds
            ]
            return pa.concat_tables(parts, promote_options="default")
        payloads = batch.column("payload").to_pylist()
        w = batch.column("width").to_numpy(zero_copy_only=False)
        h = batch.column("height").to_numpy(zero_copy_only=False)
        out = []
        for p, wi, hi in zip(payloads, w, h):
            need = int(wi) * int(hi)
            buf = np.frombuffer(p, dtype=np.uint8)
            reps = int(np.ceil(need / max(1, len(buf))))
            out.append(np.tile(buf, reps)[:need])
        flat = np.concatenate(out) if out else np.empty(0, dtype=np.uint8)
        lens = np.array([len(o) for o in out], dtype=np.int64)
        offsets = pa.array(np.concatenate([[0], np.cumsum(lens)]).astype(np.int32))
        pixels = pa.ListArray.from_arrays(offsets, pa.array(flat, type=pa.uint8()))
        return batch.append_column("pixels", pixels)


class ExtractFeatures:
    """decoded pixels -> fixed-dim feature vector (hash-projection stub:
    a deterministic random projection of the byte histogram — real
    model inference drops in here with the same actor signature)."""

    def __init__(self, dim: int = 64, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.proj = rng.normal(size=(256, dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("pixels")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = col.value_lengths().to_numpy(zero_copy_only=False)
        flat = col.flatten().to_numpy(zero_copy_only=False)
        feats = []
        start = 0
        for ln in lens:
            seg = flat[start : start + ln]
            start += ln
            hist = np.bincount(seg, minlength=256).astype(np.float32)
            hist /= max(1.0, hist.sum())
            feats.append(hist @ self.proj)
        m = np.stack(feats) if feats else np.empty((0, self.proj.shape[1]), dtype=np.float32)
        offsets = pa.array(
            (np.arange(len(feats) + 1) * self.proj.shape[1]).astype(np.int32)
        )
        arr = pa.ListArray.from_arrays(
            offsets, pa.array(m.ravel(), type=pa.float32())
        )
        return batch.append_column("features", arr)


def frame_sample(ds, every_n: int = 2, *, frame_size: int = 1024):
    """video payload -> subset of frame payloads (deterministic slice of
    ``frame_size``-byte pseudo-frames; real demuxing drops in with the
    same layout).  The byte-slice layout is SQL-reproducible
    (★frame_sample_md5 replays it with substr over the payload)."""

    def kernel(batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        nf = batch.column("n_frames").to_numpy(zero_copy_only=False)
        out_frames = []
        for p, n in zip(payloads, nf):
            frames = [
                p[i * frame_size : (i + 1) * frame_size] for i in range(int(n))
            ]
            out_frames.append(frames[::every_n])
        return batch.append_column(
            "frames", pa.array(out_frames, type=pa.list_(pa.binary()))
        )

    return ds.map_batches(kernel, batch_format="pyarrow", batch_size=64)


def decode_pipeline(ds, *, fake: bool = True, feature_dim: int = 64):
    """media table -> + pixels + features (small batches: payloads are
    fat — batch_size × payload must fit the worker heap)."""
    ds = ds.map_batches(
        DecodeMedia,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(1, 4),
    )
    return ds.map_batches(
        ExtractFeatures,
        fn_constructor_kwargs={"dim": feature_dim},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(1, 4),
    )


class ResizeImages:
    """pixels (H×W flat) -> resized pixels.

    ``method="nearest"`` (default, always available): exact
    nearest-neighbor index subsampling on the byte grid — deterministic
    and library-free.  ``method="pil"``: a REAL resampled resize via
    PIL (bilinear by default), loaded ONCE per actor in ``__init__``
    like DecodeMedia's soft dependency; raises ImportError with an
    actionable message when PIL is absent from the environment.  Both
    paths share the actor signature and output layout."""

    def __init__(
        self,
        out_w: int = 32,
        out_h: int = 32,
        method: str = "nearest",
        resample: str = "bilinear",
    ):
        self.out_w = out_w
        self.out_h = out_h
        self.method = method
        self._pil = None
        self._resample = None
        if method == "pil":
            try:
                from PIL import Image  # soft dep: not in every container
            except ImportError as e:
                raise ImportError(
                    "ResizeImages(method='pil') needs Pillow; install it "
                    "or use method='nearest' (exact subsampling, no deps)"
                ) from e
            self._pil = Image
            self._resample = {
                "nearest": Image.Resampling.NEAREST,
                "bilinear": Image.Resampling.BILINEAR,
                "bicubic": Image.Resampling.BICUBIC,
                "lanczos": Image.Resampling.LANCZOS,
            }[resample]
        elif method != "nearest":
            raise ValueError(f"unknown resize method {method!r}")

    def _one(self, grid: np.ndarray) -> np.ndarray:
        if self.method == "pil":
            img = self._pil.fromarray(grid, mode="L")
            out = img.resize(
                (self.out_w, self.out_h), resample=self._resample
            )
            return np.asarray(out, dtype=np.uint8).ravel()
        hi, wi = grid.shape
        ys = (np.arange(self.out_h) * hi // self.out_h).astype(np.int64)
        xs = (np.arange(self.out_w) * wi // self.out_w).astype(np.int64)
        return grid[np.ix_(ys, xs)].ravel()

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("pixels")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = col.value_lengths().to_numpy(zero_copy_only=False)
        flat = col.flatten().to_numpy(zero_copy_only=False)
        w = batch.column("width").to_numpy(zero_copy_only=False)
        h = batch.column("height").to_numpy(zero_copy_only=False)
        out = []
        start = 0
        for ln, wi, hi in zip(lens, w, h):
            img = flat[start : start + ln]
            start += ln
            if ln != wi * hi:
                out.append(np.zeros(self.out_w * self.out_h, dtype=np.uint8))
                continue
            out.append(self._one(img.reshape(int(hi), int(wi))))
        flat_out = np.concatenate(out) if out else np.empty(0, dtype=np.uint8)
        offsets = pa.array(
            (np.arange(len(out) + 1) * self.out_w * self.out_h).astype(np.int32)
        )
        arr = pa.ListArray.from_arrays(offsets, pa.array(flat_out, type=pa.uint8()))
        t = batch.append_column("pixels_resized", arr)
        t = t.append_column(
            "resized_w", pa.array([self.out_w] * batch.num_rows, type=pa.int32())
        )
        return t.append_column(
            "resized_h", pa.array([self.out_h] * batch.num_rows, type=pa.int32())
        )


def resize_images(
    ds,
    out_w: int = 32,
    out_h: int = 32,
    method: str = "nearest",
    resample: str = "bilinear",
):
    return ds.map_batches(
        ResizeImages,
        fn_constructor_kwargs={
            "out_w": out_w,
            "out_h": out_h,
            "method": method,
            "resample": resample,
        },
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(1, 4),
    )
