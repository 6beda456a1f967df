"""Per-segment H2D byte breakdown + residual sparsity stats for a stream.

Usage: JAX_PLATFORMS=cpu python tools/analyze_wire.py bench_streams/r4a_ra_main_1080p.265 [n_frames]

Parses (native core) and reconstructs with the np engine while recording,
per picture: nibble-arena / sideband / escape / intra-meta / motion-delta
bytes, plus the per-TU-size nonzero-coefficient histogram the sparse
residual format (VERDICT r04 item 1) is sized against.
"""
import sys
import os
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openhevc_tpu.decoder import Decoder
from openhevc_tpu.models.pipeline import motion_diff2, SIZES

stats = dict(frames=0, arena4=0, arena16=0, esc=0, meta=0, md=0,
             n_tu={s: 0 for s in SIZES}, cap_tu={s: 0 for s in SIZES},
             nnz={s: 0 for s in SIZES}, coeff_cells={s: 0 for s in SIZES},
             nnz_hist={s: np.zeros(64, np.int64) for s in SIZES},
             level_gt7={s: 0 for s in SIZES},
             csb_coded={s: 0 for s in SIZES}, csb_total={s: 0 for s in SIZES})


def record(fs):
    npk = fs.native_pack
    stats["frames"] += 1
    if npk is not None:
        stats["arena4"] += npk["arena4"].nbytes
        stats["arena16"] += npk["arena16"].nbytes
        stats["esc"] += npk["esc"].nbytes
        stats["meta"] += npk["meta"].nbytes
        for (s, cap, _sm, _ne) in npk["caps"]:
            stats["cap_tu"][s] += cap
    raw = fs.native_raw
    if raw is not None:
        cm = raw["cb_meta"]
        arena = raw["cb_levels"]
        for s in SIZES:
            log2s = int(np.log2(s))
            sel = np.nonzero(cm[:, 3] == log2s)[0]
            if not len(sel):
                continue
            stats["n_tu"][s] += len(sel)
            offs = cm[sel, 6]
            g = offs[:, None] + np.arange(s * s)[None, :]
            lv = arena[g]                      # [n, s*s]
            nz = lv != 0
            nnz_per = nz.sum(1)
            stats["nnz"][s] += int(nnz_per.sum())
            stats["coeff_cells"][s] += lv.size
            h = np.bincount(np.minimum(nnz_per, 63), minlength=64)
            stats["nnz_hist"][s] += h
            stats["level_gt7"][s] += int((np.abs(lv) > 7).sum())
            # coded 4x4 sub-blocks (any nonzero in the 4x4 cell)
            n = len(sel)
            lv2 = lv.reshape(n, s // 4, 4, s // 4, 4)
            csb = np.any(lv2 != 0, axis=(2, 4))
            stats["csb_coded"][s] += int(csb.sum())
            stats["csb_total"][s] += csb.size
    # scan-order prefix bytes: per TU, ceil((last_sig+1)/2) nibble bytes
    # in HEVC up-right diagonal scan order (coeffs concentrate at low
    # frequency, so the prefix-trim ships only the significant head)
    if raw is not None:
        from openhevc_tpu.bitstream.syntax import _diag_scan

        def diag_scan(s):
            """Raster indices in HEVC residual scan order: 4x4 CGs in
            up-right diagonal order, coeffs within a CG likewise."""
            cg = _diag_scan(s // 4)
            inner = _diag_scan(4)
            idx = []
            for (cx, cy) in cg:
                for (ix, iy) in inner:
                    idx.append((cy * 4 + iy) * s + cx * 4 + ix)
            return np.array(idx)

        cm = raw["cb_meta"]
        arena = raw["cb_levels"]
        for s in SIZES:
            log2s = int(np.log2(s))
            sel = np.nonzero(cm[:, 3] == log2s)[0]
            if not len(sel):
                continue
            offs = cm[sel, 6]
            g = offs[:, None] + np.arange(s * s)[None, :]
            lv = arena[g]                      # [n, s*s] raster
            scan = diag_scan(s)                # [s*s] raster idx in scan order
            lv_scan = lv[:, scan]
            nz = lv_scan != 0
            last = np.where(nz.any(1), s * s - 1 - np.argmax(nz[:, ::-1], 1),
                            -1)
            stats.setdefault("prefix_bytes", {s2: 0 for s2 in SIZES})
            stats["prefix_bytes"][s] += int(((last + 2) // 2).sum())
    mc = getattr(fs, "motion", None)
    if mc is not None and fs.inter_pbs:
        pf4 = np.asarray(mc.pred_flag, np.uint8)
        h4, w4 = pf4.shape
        slot = np.zeros((2, h4, w4), np.uint8)
        md = motion_diff2(pf4, slot, np.asarray(mc.mv, np.int16))
        stats["md"] += md["idx"].nbytes + md["vals"].nbytes


def main():
    path = sys.argv[1]
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    data = open(path, "rb").read()
    dec = Decoder(engine="np")

    def patched(self, fs, refs):
        # byte stats don't depend on pixel values: skip reconstruction,
        # return mid-gray planes so later frames' packing still runs
        record(fs)
        sps = fs.sps
        mid = 1 << (sps.bit_depth - 1)
        H, W = sps.height, sps.width
        hs, vs = sps.hshift1, sps.vshift1
        return [np.full((H, W), mid, np.int32),
                np.full((H >> vs, W >> hs), mid, np.int32),
                np.full((H >> vs, W >> hs), mid, np.int32)]

    Decoder._reconstruct = patched
    dec.decode(data)
    dec.flush()
    del n_frames
    f = stats["frames"]
    print(f"frames analyzed: {f}")
    tot = (stats["arena4"] + stats["arena16"] + stats["esc"] +
           stats["meta"] + stats["md"])
    for k in ("arena4", "arena16", "esc", "meta", "md"):
        print(f"  {k:8s}: {stats[k]/f/1024:9.1f} KiB/frame")
    print(f"  total   : {tot/f/1024:9.1f} KiB/frame (pre-motion-slot/wt)")
    print("\nper-size residual stats:")
    print(f"{'size':>5} {'TUs/f':>8} {'cap/f':>8} {'dens%':>6} "
          f"{'nnz/TU':>7} {'csb%':>6} {'gt7/f':>7} "
          f"{'dense KiB/f':>11} {'sparse3B KiB/f':>14} {'csb8B KiB/f':>11}")
    for s in SIZES:
        n = stats["n_tu"][s]
        if not n:
            continue
        cells = stats["coeff_cells"][s]
        nnz = stats["nnz"][s]
        capn = stats["cap_tu"][s]
        dense = capn * s * s / 2 / f / 1024          # nibble bytes
        sparse = (3 * nnz + 2 * n) / f / 1024        # 3B/coeff + 2B count
        csb = (stats["csb_coded"][s] * 8 +
               n * max(1, (s // 4) * (s // 4) // 8)) / f / 1024
        pfx = stats.get("prefix_bytes", {}).get(s, 0) / f / 1024
        print(f"{s:>5} {n/f:>8.1f} {capn/f:>8.1f} "
              f"{100*nnz/cells:>6.2f} {nnz/n:>7.2f} "
              f"{100*stats['csb_coded'][s]/stats['csb_total'][s]:>6.1f} "
              f"{stats['level_gt7'][s]/f:>7.1f} "
              f"{dense:>11.1f} {sparse:>14.1f} {csb:>11.1f} "
              f"pfx={pfx:>8.1f}")


if __name__ == "__main__":
    main()
