"""Y4M (YUV4MPEG2) video codec — a REAL standard interchange container
(mplayer/ffmpeg `yuv4mpegpipe`): plain-text stream header, per-frame
``FRAME\\n`` markers, planar YUV420 payload. numpy only.

This moves video from the stub set to a genuine format the way PNG did for
images and WAV for audio: encode performs real BT.601 full-range RGB→YUV
conversion (integer arithmetic — the fixed-point form used by real codecs)
plus genuine 4:2:0 chroma subsampling (a lossy compression step), decode
inverts it with clamping. Compressed inter-frame codecs (mp4/h264) stay
stubbed — the sandbox has no ffmpeg (reference analog: per-filetype extract
dispatch, /root/reference/europarl/rules/extraction.py:27-52).

Integer transforms (8-bit full range, all exactly reproducible in SQL —
the luma plane math backs the oracle-checked codec query):

  Y =  (77·R + 150·G +  29·B + 128) >> 8
  U = ((-43·R -  85·G + 128·B + 128) >> 8) + 128
  V = ((128·R - 107·G -  21·B + 128) >> 8) + 128
  chroma 2×2 subsample: (a + b + c + d + 2) >> 2

Decode (fixed-point inverse, clipped to [0, 255]):

  R = clip(Y + (351·(V-128) + 128 >> 8))
  G = clip(Y - ( 86·(U-128) + 179·(V-128) + 128 >> 8))
  B = clip(Y + (443·(U-128) + 128 >> 8))
"""

from __future__ import annotations

import numpy as np

from .kitguard import rejects_malformed

MAGIC = b"YUV4MPEG2"


def rgb_to_yuv420(px: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(h, w, 3) uint8 RGB → (Y(h,w), U(h/2,w/2), V(h/2,w/2)) uint8 planes.
    h and w must be even (4:2:0 requires it — y4m's own constraint)."""
    h, w, _ = px.shape
    if h % 2 or w % 2:
        raise ValueError("y4m 4:2:0 requires even dimensions")
    r = px[:, :, 0].astype(np.int32)
    g = px[:, :, 1].astype(np.int32)
    b = px[:, :, 2].astype(np.int32)
    y = (77 * r + 150 * g + 29 * b + 128) >> 8
    u = ((-43 * r - 85 * g + 128 * b + 128) >> 8) + 128
    v = ((128 * r - 107 * g - 21 * b + 128) >> 8) + 128

    def sub(p: np.ndarray) -> np.ndarray:
        q = p.reshape(h // 2, 2, w // 2, 2)
        return ((q[:, 0, :, 0] + q[:, 0, :, 1] + q[:, 1, :, 0] + q[:, 1, :, 1] + 2) >> 2)

    return (
        y.astype(np.uint8),
        sub(u).astype(np.uint8),
        sub(v).astype(np.uint8),
    )


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Planes → (h, w, 3) uint8 RGB (nearest-neighbor chroma upsample)."""
    yl = y.astype(np.int32)
    uu = (np.repeat(np.repeat(u, 2, axis=0), 2, axis=1).astype(np.int32)) - 128
    vv = (np.repeat(np.repeat(v, 2, axis=0), 2, axis=1).astype(np.int32)) - 128
    r = yl + ((351 * vv + 128) >> 8)
    g = yl - ((86 * uu + 179 * vv + 128) >> 8)
    b = yl + ((443 * uu + 128) >> 8)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def y4m_encode(frames: np.ndarray, fps: int = 25) -> bytes:
    """(n, h, w, 3) uint8 RGB frames → Y4M bytes (C420jpeg = full-range
    4:2:0, co-sited — the layout every y4m consumer accepts)."""
    n, h, w, _ = frames.shape
    out = [MAGIC + f" W{w} H{h} F{fps}:1 Ip A1:1 C420jpeg\n".encode()]
    for i in range(n):
        y, u, v = rgb_to_yuv420(frames[i])
        out.append(b"FRAME\n")
        out.append(y.tobytes())
        out.append(u.tobytes())
        out.append(v.tobytes())
    return b"".join(out)


@rejects_malformed("y4m")
def y4m_parse_header(body: bytes) -> tuple[int, int, int, int]:
    """Y4M bytes → (w, h, fps, n_frames) without decoding pixel data."""
    nl = body.index(b"\n")
    head = body[:nl].split(b" ")
    if head[0] != MAGIC:
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = fps = 0
    for tok in head[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            fps = int(tok[1:].split(b":")[0])
    if w <= 0 or h <= 0:
        raise ValueError("y4m: missing or non-positive W/H header")
    fsz = len(b"FRAME\n") + w * h + 2 * (w // 2) * (h // 2)
    # Y4M carries no frame count — length implies it. A body that is not an
    # exact multiple of the frame size was truncated mid-frame; reject it
    # instead of silently dropping the partial tail (a truncation at an exact
    # frame boundary is indistinguishable from a shorter video by design).
    if (len(body) - nl - 1) % fsz != 0:
        raise ValueError("y4m: truncated mid-frame")
    n_frames = (len(body) - nl - 1) // fsz
    return w, h, fps, n_frames


@rejects_malformed("y4m")
def y4m_decode(body: bytes) -> tuple[np.ndarray, int]:
    """Y4M bytes → ((n, h, w, 3) uint8 RGB frames, fps)."""
    w, h, fps, n = y4m_parse_header(body)
    nl = body.index(b"\n")
    plane = w * h
    csz = (w // 2) * (h // 2)
    fsz = len(b"FRAME\n") + plane + 2 * csz
    frames = np.empty((n, h, w, 3), dtype=np.uint8)
    off = nl + 1
    for i in range(n):
        if body[off : off + 6] != b"FRAME\n":
            raise ValueError(f"bad FRAME marker at frame {i}")
        p = off + 6
        y = np.frombuffer(body[p : p + plane], dtype=np.uint8).reshape(h, w)
        u = np.frombuffer(body[p + plane : p + plane + csz], dtype=np.uint8).reshape(h // 2, w // 2)
        v = np.frombuffer(body[p + plane + csz : p + fsz - 6], dtype=np.uint8).reshape(h // 2, w // 2)
        frames[i] = yuv420_to_rgb(y, u, v)
        off += fsz
    return frames, fps


@rejects_malformed("y4m")
def y4m_luma_planes(body: bytes) -> np.ndarray:
    """Y4M bytes → (n, h, w) uint8 luma planes — the exact encoded Y values
    (no decode round-trip), which integer math makes SQL-predictable."""
    w, h, _, n = y4m_parse_header(body)
    nl = body.index(b"\n")
    plane = w * h
    fsz = len(b"FRAME\n") + plane + 2 * (w // 2) * (h // 2)
    out = np.empty((n, h, w), dtype=np.uint8)
    off = nl + 1
    for i in range(n):
        p = off + 6
        out[i] = np.frombuffer(body[p : p + plane], dtype=np.uint8).reshape(h, w)
        off += fsz
    return out
