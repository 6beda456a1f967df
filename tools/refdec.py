"""ctypes harness over the reference openHEVC decoder (golden oracle).

Builds are produced by tools/build_reference.sh into /tmp/ref_build.
Used ONLY for testing (golden YUV output) and CPU baseline measurement —
never on the TPU decode path.

API mirrored from /root/reference/gpac/modules/openhevc_dec/openHevcWrapper.h:79-98.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from dataclasses import dataclass

LIB_PATH = "/tmp/ref_build/libLibOpenHevcWrapper.so"
BUILD_SCRIPT = os.path.join(os.path.dirname(__file__), "build_reference.sh")


class _Rational(ctypes.Structure):
    _fields_ = [("num", ctypes.c_int), ("den", ctypes.c_int)]


class _FrameInfo(ctypes.Structure):
    _fields_ = [
        ("nYPitch", ctypes.c_int),
        ("nUPitch", ctypes.c_int),
        ("nVPitch", ctypes.c_int),
        ("nBitDepth", ctypes.c_int),
        ("nWidth", ctypes.c_int),
        ("nHeight", ctypes.c_int),
        ("chromat_format", ctypes.c_int),
        ("sample_aspect_ratio", _Rational),
        ("frameRate", _Rational),
        ("display_picture_number", ctypes.c_int),
        ("flag", ctypes.c_int),
        ("nTimeStamp", ctypes.c_int64),
    ]


class _FrameCpy(ctypes.Structure):
    _fields_ = [
        ("pvY", ctypes.c_void_p),
        ("pvU", ctypes.c_void_p),
        ("pvV", ctypes.c_void_p),
        ("frameInfo", _FrameInfo),
    ]


def ensure_built() -> str:
    if not os.path.exists(LIB_PATH):
        subprocess.run(["bash", BUILD_SCRIPT], check=True)
    return LIB_PATH


@dataclass
class DecodedFrame:
    y: bytes
    u: bytes
    v: bytes
    width: int
    height: int
    bit_depth: int
    chroma_format: int  # 0=420 1=422 2=444
    poc: int


class RefDecoder:
    """One-shot reference decode of an Annex-B bytestream."""

    def __init__(self, nb_threads: int = 1, thread_type: int = 1,
                 check_md5: bool = False, temporal_layer: int | None = None,
                 active_decoders: int = 0):
        ensure_built()
        lib = ctypes.CDLL(LIB_PATH)
        lib.libOpenHevcInit.restype = ctypes.c_void_p
        lib.libOpenHevcInit.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.libOpenHevcDecode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int64]
        lib.libOpenHevcStartDecoder.argtypes = [ctypes.c_void_p]
        lib.libOpenHevcGetPictureInfo.argtypes = [ctypes.c_void_p,
                                                  ctypes.POINTER(_FrameInfo)]
        lib.libOpenHevcGetOutputCpy.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(_FrameCpy)]
        lib.libOpenHevcSetCheckMD5.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.libOpenHevcSetTemporalLayer_id.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.libOpenHevcSetActiveDecoders.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.libOpenHevcSetViewLayers.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.libOpenHevcClose.argtypes = [ctypes.c_void_p]
        self.lib = lib
        self.handle = ctypes.c_void_p(lib.libOpenHevcInit(nb_threads, thread_type))
        if active_decoders:
            lib.libOpenHevcSetActiveDecoders(self.handle, active_decoders)
            lib.libOpenHevcSetViewLayers(self.handle, active_decoders)
        lib.libOpenHevcSetCheckMD5(self.handle, 1 if check_md5 else 0)
        rc = lib.libOpenHevcStartDecoder(self.handle)
        assert rc == 1, f"libOpenHevcStartDecoder failed: {rc}"
        if temporal_layer is not None:
            # must come after StartDecoder: hevc_init_context resets
            # temporal_layer_id to 8 (hevc.c:4307)
            lib.libOpenHevcSetTemporalLayer_id(self.handle, temporal_layer)
        self._closed = False

    def _get_frame(self, got: int) -> DecodedFrame | None:
        info = _FrameInfo()
        self.lib.libOpenHevcGetPictureInfo(self.handle, ctypes.byref(info))
        w, h = info.nWidth, info.nHeight
        if w <= 0 or h <= 0:
            return None
        nbytes = 2 if info.nBitDepth > 8 else 1
        cf = info.chromat_format
        cw = w if cf == 2 else w // 2
        ch = h if cf >= 1 else h // 2
        ysz, csz = w * h * nbytes, cw * ch * nbytes
        ybuf = ctypes.create_string_buffer(ysz)
        ubuf = ctypes.create_string_buffer(csz)
        vbuf = ctypes.create_string_buffer(csz)
        frame = _FrameCpy()
        frame.pvY = ctypes.cast(ybuf, ctypes.c_void_p)
        frame.pvU = ctypes.cast(ubuf, ctypes.c_void_p)
        frame.pvV = ctypes.cast(vbuf, ctypes.c_void_p)
        rc = self.lib.libOpenHevcGetOutputCpy(self.handle, got, ctypes.byref(frame))
        if rc != 1:
            return None
        return DecodedFrame(y=ybuf.raw, u=ubuf.raw, v=vbuf.raw,
                            width=w, height=h, bit_depth=info.nBitDepth,
                            chroma_format=cf,
                            poc=frame.frameInfo.display_picture_number)

    def decode_stream(self, data: bytes) -> list[DecodedFrame]:
        """Decode a whole Annex-B stream, splitting at AU boundaries.

        We split on start codes and group NALs into access units at VCL NALs
        whose first_slice_segment_in_pic_flag is set (same AU heuristic as the
        reference parser, hevc_parser.c:41)."""
        frames: list[DecodedFrame] = []
        for au in split_access_units(data):
            got = self.lib.libOpenHevcDecode(self.handle, au, len(au), 0)
            if got > 0:
                f = self._get_frame(got)
                if f:
                    frames.append(f)
        # flush
        for _ in range(64):
            got = self.lib.libOpenHevcDecode(self.handle, b"", 0, 0)
            if got <= 0:
                break
            f = self._get_frame(got)
            if f:
                frames.append(f)
        return frames

    def close(self):
        if not self._closed:
            self.lib.libOpenHevcClose(self.handle)
            self._closed = True


def find_start_codes(data: bytes) -> list[int]:
    """Byte offsets of the first byte AFTER each 3-byte start code 001."""
    out = []
    i = 0
    n = len(data)
    while i + 2 < n:
        j = data.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        out.append(j + 3)
        i = j + 3
    return out
def split_nals(data: bytes) -> list[bytes]:
    starts = find_start_codes(data)
    nals = []
    for k, s in enumerate(starts):
        e = starts[k + 1] - 3 if k + 1 < len(starts) else len(data)
        # trailing zeros before next start code belong to padding
        while e > s and data[e - 1] == 0 and k + 1 < len(starts):
            e -= 1
        nals.append(data[s:e])
    return nals


def split_access_units(data: bytes) -> list[bytes]:
    """Group an Annex-B stream into access units (one coded picture each)."""
    aus: list[bytes] = []
    cur = bytearray()
    for nal in split_nals(data):
        if len(nal) < 3:
            continue
        nal_type = (nal[0] >> 1) & 0x3F
        layer_id = ((nal[0] & 1) << 5) | (nal[1] >> 3)
        is_vcl = nal_type <= 31
        first_slice = is_vcl and len(nal) > 2 and (nal[2] & 0x80) != 0
        if cur and layer_id == 0 and (
                (is_vcl and first_slice) or nal_type in (32, 33, 34, 35, 39)):
            # new AU starts at first-slice VCL or at VPS/SPS/PPS/AUD/prefix-SEI
            if any(((n[0] >> 1) & 0x3F) <= 31 for n in split_nals(bytes(cur))):
                aus.append(bytes(cur))
                cur = bytearray()
        cur += b"\x00\x00\x01" + nal
    if cur:
        aus.append(bytes(cur))
    return aus


def decode_file(path: str, **kw) -> list[DecodedFrame]:
    with open(path, "rb") as f:
        data = f.read()
    dec = RefDecoder(**kw)
    try:
        return dec.decode_stream(data)
    finally:
        dec.close()
