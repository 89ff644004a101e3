"""Multimodal (image/audio/video) column stages — Ray-side plumbing.

Binary payloads ride as opaque ``binary`` columns with typed metadata
columns next to them. The decode kernels themselves are STUBS (no
image/audio libraries in this environment — clearly marked below); the
actor-pool plumbing, schemas, batch sizing and output layout are real and
tested, so swapping a real decoder in is a one-function change.

Memory note: binary payloads dominate the batch; callers should pass a
small ``batch_size`` (e.g. 64) so batch × concurrency stays inside the
worker heap, and let the object store spill.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """DETERMINISTIC FAKE of a decode+feature-extract kernel.

    Real implementation would be e.g. PIL.Image.open / torchaudio.load →
    model features; neither library exists in this container. The fake
    derives a stable feature vector from the payload bytes so tests can
    assert exact values and retries are reproducible.
    """
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((out_dim * 4) // len(h) + 1))[: out_dim * 4], np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def probe_image_header(payload: bytes) -> tuple[str | None, int, int]:
    """Dependency-free image header probe → (format, width, height).

    A REAL decode of the container headers in pure Python (no PIL
    needed): PNG IHDR, GIF logical-screen descriptor, and JPEG SOF
    segments (walking APPn/COM/DQT/... segments to the first frame
    header, as any JPEG reader must). Unrecognized payloads return
    ``(None, -1, -1)`` — callers keep such rows with NULL/sentinel
    metadata rather than guessing.
    """
    p = payload or b""
    # PNG: 8-byte signature, then the IHDR chunk (len+type at 8..16,
    # big-endian width/height at 16..24)
    if len(p) >= 24 and p[:8] == b"\x89PNG\r\n\x1a\n" and p[12:16] == b"IHDR":
        return (
            "png",
            int.from_bytes(p[16:20], "big"),
            int.from_bytes(p[20:24], "big"),
        )
    # GIF: 6-byte version, little-endian width/height at 6..10
    if len(p) >= 10 and p[:6] in (b"GIF87a", b"GIF89a"):
        return (
            "gif",
            int.from_bytes(p[6:8], "little"),
            int.from_bytes(p[8:10], "little"),
        )
    # JPEG: SOI, then marker segments until a start-of-frame (SOFn,
    # 0xC0–0xCF except DHT 0xC4, JPG 0xC8, DAC 0xCC) carrying
    # big-endian height at +5, width at +7
    if len(p) >= 4 and p[:2] == b"\xff\xd8":
        pos = 2
        while pos + 2 <= len(p):
            if p[pos] != 0xFF:
                break
            # ITU T.81 B.1.1.2: any number of 0xFF fill bytes may precede
            # the marker's identifying byte — skip them
            while pos + 1 < len(p) and p[pos + 1] == 0xFF:
                pos += 1
            if pos + 2 > len(p):
                break
            code = p[pos + 1]
            if code in (0x01, 0xD8) or 0xD0 <= code <= 0xD7:
                pos += 2  # standalone marker, no length field
                continue
            if code == 0xD9:  # EOI
                break
            if pos + 4 > len(p):
                break
            seglen = int.from_bytes(p[pos + 2 : pos + 4], "big")
            if seglen < 2:
                break
            if 0xC0 <= code <= 0xCF and code not in (0xC4, 0xC8, 0xCC):
                if pos + 9 <= len(p):
                    return (
                        "jpeg",
                        int.from_bytes(p[pos + 7 : pos + 9], "big"),
                        int.from_bytes(p[pos + 5 : pos + 7], "big"),
                    )
                break
            pos += 2 + seglen
    return (None, -1, -1)


def probe_headers(media: rd.Dataset, batch_size: int = 1024) -> rd.Dataset:
    """Header-probe stage: (media_id, fmt, width, height) per row via
    :func:`probe_image_header`. Plain task map (the probe is stateless
    and O(1) per payload — only the first ~kB of each payload is ever
    touched, so the stage is I/O-bound on the binary column read)."""

    def f(batch: pa.Table) -> pa.Table:
        fmts, ws, hs = [], [], []
        for p in batch.column("payload").to_pylist():
            fmt, w, h = probe_image_header(p)
            fmts.append(fmt)
            ws.append(w)
            hs.append(h)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "fmt": pa.array(fmts, pa.string()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
            }
        )

    return media.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def synth_image_payload(fmt: str, width: int, height: int) -> bytes:
    """Deterministic minimal-but-well-formed image headers for tests and
    oracle-checked pipelines (the bodies are not valid pixel data — the
    HEADERS are real and parse with any conformant reader)."""
    if fmt == "png":
        ihdr = (
            width.to_bytes(4, "big")
            + height.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0])
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + (13).to_bytes(4, "big") + b"IHDR" + ihdr + b"\x00" * 4
        )
    if fmt == "gif":
        return (
            b"GIF89a"
            + width.to_bytes(2, "little")
            + height.to_bytes(2, "little")
            + b"\xf7\x00\x00"
        )
    if fmt == "jpeg":
        app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
        sof0 = (
            b"\xff\xc0"
            + (17).to_bytes(2, "big")
            + b"\x08"
            + height.to_bytes(2, "big")
            + width.to_bytes(2, "big")
            + b"\x03" + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
        )
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    raise ValueError(f"unknown synth format {fmt!r}")


def _try_pil():
    """PIL.Image if importable, else None (this container has no decoder
    libraries; a real deployment picks the real path up automatically)."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


class MediaFeatureExtractor:
    """Actor-pool stage: "model" initialised once per actor, batched
    feature extraction per ``__call__``. Output: (media_id, kind,
    feature: list<float32>).

    Decoder selection (once, in ``__init__``): ``use_real_decoder=None``
    (auto) uses PIL when importable for image payloads that actually
    decode, and the deterministic fake otherwise — undecodable payloads
    (e.g. synthetic bytes) fall back per row, so determinism tests hold
    on any machine. ``True`` requires PIL (raises if absent); ``False``
    forces the fake."""

    def __init__(self, out_dim: int = 32, use_real_decoder: bool | None = None):
        self.out_dim = out_dim
        self.Image = None
        if use_real_decoder is not False:
            self.Image = _try_pil()
            if use_real_decoder and self.Image is None:
                raise NotImplementedError(
                    "use_real_decoder=True but PIL is not importable; "
                    "install Pillow (or use torchaudio/decord for a/v)"
                )

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if self.Image is not None and kind == "image":
            import io

            try:
                im = self.Image.open(io.BytesIO(payload))
                im = im.convert("L").resize((8, 8))
                px = np.asarray(im, np.float32).ravel() / 255.0
                reps = -(-self.out_dim // px.size)  # ceil
                return np.tile(px, reps)[: self.out_dim]
            except Exception:
                pass  # not a decodable image → deterministic fake
        return _fake_decode(payload, self.out_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        feats = [
            self._decode(p or b"", k) for p, k in zip(payloads, kinds)
        ]
        m = np.vstack(feats) if feats else np.empty((0, self.out_dim), np.float32)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.ravel(), pa.float32()), self.out_dim
                ),
            }
        )


class FrameSampler:
    """Actor-pool stage: sample ``num_frames`` evenly spaced pseudo-frames
    per video payload. STUB decode (see `_fake_decode`); the fan-out
    row→rows layout (one output row per frame) is the real contract."""

    def __init__(self, num_frames: int = 4, frame_dim: int = 16):
        self.num_frames = num_frames
        self.frame_dim = frame_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, feats = [], [], []
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "video":
                continue
            for f in range(self.num_frames):
                ids.append(mid)
                fidx.append(f)
                feats.append(_fake_decode((payload or b"") + bytes([f]), self.frame_dim))
        m = np.vstack(feats) if feats else np.empty((0, self.frame_dim), np.float32)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.ravel(), pa.float32()), self.frame_dim
                ),
            }
        )


def extract_features(
    media: rd.Dataset,
    out_dim: int = 32,
    batch_size: int = 64,
    concurrency=(1, 8),
) -> rd.Dataset:
    return media.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"out_dim": out_dim},
        batch_format="pyarrow",
        batch_size=batch_size,  # small: payloads dominate memory
        concurrency=concurrency,
    )


def sample_frames(
    media: rd.Dataset,
    num_frames: int = 4,
    batch_size: int = 64,
    concurrency=(1, 8),
) -> rd.Dataset:
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"num_frames": num_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media rows for tests/benches."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": list(range(n)),
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [rng.integers(0, 256, size=128, dtype=np.uint8).tobytes() for _ in range(n)],
        "mime": ["application/octet-stream"] * n,
        "width": [64] * n,
        "height": [64] * n,
        "duration_ms": [1000] * n,
    }
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


class ImageResizer:
    """Actor-pool stage: resize image payloads to (out_w, out_h).

    Decoder selection as in :class:`MediaFeatureExtractor`: auto-uses PIL
    when importable and the payload decodes (re-encoded as PNG),
    deterministic stub otherwise; the Ray-side contract is real either
    way: payload-in/payload-out with updated width/height metadata,
    non-image rows passed through untouched.
    """

    def __init__(
        self,
        out_w: int = 32,
        out_h: int = 32,
        use_real_decoder: bool | None = None,
    ):
        self.out_w = out_w
        self.out_h = out_h
        self.Image = None
        if use_real_decoder is not False:
            self.Image = _try_pil()
            if use_real_decoder and self.Image is None:
                raise NotImplementedError(
                    "use_real_decoder=True but PIL is not importable"
                )

    def _resize_stub(self, payload: bytes) -> bytes:
        # deterministic fake: derives out_w*out_h "pixels" from the payload
        h = hashlib.sha256(payload).digest()
        need = self.out_w * self.out_h
        return (h * (need // len(h) + 1))[:need]

    def _resize(self, payload: bytes) -> bytes:
        if self.Image is not None:
            import io

            try:
                im = self.Image.open(io.BytesIO(payload))
                im = im.resize((self.out_w, self.out_h))
                buf = io.BytesIO()
                im.save(buf, format="PNG")
                return buf.getvalue()
            except Exception:
                pass  # undecodable payload → deterministic stub
        return self._resize_stub(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_p, out_w, out_h = [], [], []
        for k, p, w, hgt in zip(
            kinds, payloads,
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
        ):
            if k == "image":
                out_p.append(self._resize(p or b""))
                out_w.append(self.out_w)
                out_h.append(self.out_h)
            else:
                out_p.append(p)
                out_w.append(w)
                out_h.append(hgt)
        t = batch.drop_columns(["payload", "width", "height"])
        return (
            t.append_column("payload", pa.array(out_p, pa.binary()))
            .append_column("width", pa.array(out_w, pa.int32()))
            .append_column("height", pa.array(out_h, pa.int32()))
        )


def resize_images(
    media: rd.Dataset,
    out_w: int = 32,
    out_h: int = 32,
    batch_size: int = 64,
    concurrency=(1, 8),
) -> rd.Dataset:
    return media.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
