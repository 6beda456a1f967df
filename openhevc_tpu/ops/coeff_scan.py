"""HEVC residual coefficient scan LUTs for the v2 wire format.

The coefficient payload ships as a scan-order PREFIX per TU (everything
past the last significant coefficient in scan order is zero and is not
transported) — DCT energy concentrates at low frequency, which the
up-right diagonal scan visits first, so the prefix is short for typical
content (the same locality the reference's CABAC residual coding
exploits, hevc_cabac.c:1372's last_significant_coeff + coded-sub-block
loop).

Scan model (6.5.3): 4x4 coefficient groups in up-right diagonal order
over the TU, coefficients within each group likewise. Index 0 is DC.
These LUTs are shared by the Python packer (models/pipeline._pack_arena),
the device unpack (models/pipeline._residual_acc) and mirrored by the
native packer (native/hevcparse.cc hevc_pack_frame).
"""
import numpy as np


def _diag(n):
    """Up-right diagonal scan positions [(x, y), ...] over an n x n grid
    (matches bitstream/syntax.py::_diag_scan)."""
    out = []
    x = y = 0
    while len(out) < n * n:
        while y >= 0:
            if x < n and y < n:
                out.append((x, y))
            y -= 1
            x += 1
        y = x
        x = 0
        if y >= 2 * n - 1:
            break
    return out


def _scan_raster(s):
    """Raster indices in scan order for an s x s TU: scan[i] = raster
    index of the i-th scanned coefficient."""
    cg = _diag(s // 4) if s > 4 else [(0, 0)]
    inner = _diag(4)
    idx = np.empty(s * s, np.int32)
    i = 0
    for (cx, cy) in cg:
        for (ix, iy) in inner:
            idx[i] = (cy * 4 + iy) * s + cx * 4 + ix
            i += 1
    return idx


# raster index of each scan position, per TU size
SCAN = {s: _scan_raster(s) for s in (4, 8, 16, 32)}
# scan position of each raster index (the device-side inverse permute)
INV_SCAN = {}
for _s, _sc in SCAN.items():
    _inv = np.empty(_s * _s, np.int32)
    _inv[_sc] = np.arange(_s * _s, dtype=np.int32)
    INV_SCAN[_s] = _inv
