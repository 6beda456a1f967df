"""CABAC engine round-trip tests (encoder vs spec-form decoder)."""
import random

from openhevc_tpu.bitstream.bits import (BitWriter, BitReader, escape_rbsp,
                                         unescape_rbsp)
from openhevc_tpu.bitstream import cabac


def test_bitio_roundtrip():
    rnd = random.Random(0)
    for _ in range(50):
        vals = [(rnd.getrandbits(rnd.randint(1, 24)), )
                for _ in range(rnd.randint(1, 100))]
        bw = BitWriter()
        seq = []
        for (v,) in vals:
            mode = rnd.choice(["u", "ue", "se"])
            if mode == "u":
                n = max(1, v.bit_length())
                bw.put(v, n)
                seq.append(("u", v, n))
            elif mode == "ue":
                bw.ue(v)
                seq.append(("ue", v, 0))
            else:
                sv = v - (1 << 23)
                bw.se(sv)
                seq.append(("se", sv, 0))
        bw.align_zero()
        r = BitReader(bw.getvalue())
        for mode, v, n in seq:
            if mode == "u":
                assert r.read(n) == v
            elif mode == "ue":
                assert r.ue() == v
            else:
                assert r.se() == v


def test_rbsp_escape_roundtrip():
    rnd = random.Random(1)
    for _ in range(200):
        raw = bytes(rnd.choice([0, 0, 0, 1, 2, 3, 255])
                    for _ in range(rnd.randint(0, 64)))
        esc = escape_rbsp(raw)
        assert b"\x00\x00\x00" not in esc or esc.endswith(b"\x00\x00")
        assert unescape_rbsp(esc) == raw


def test_cabac_roundtrip_mixed():
    rnd = random.Random(2)
    for _ in range(100):
        n_ctx = 8
        qp = rnd.randint(0, 51)
        inits = [rnd.randint(0, 255) for _ in range(n_ctx)]
        enc_ctx = [cabac.init_context_state(v, qp) for v in inits]
        dec_ctx = list(enc_ctx)
        ops = []
        for _ in range(rnd.randint(1, 300)):
            k = rnd.choice(["r", "r", "b", "bb"])
            if k == "r":
                ops.append(("r", rnd.randrange(n_ctx), rnd.randint(0, 1)))
            elif k == "b":
                ops.append(("b", 0, rnd.randint(0, 1)))
            else:
                nb = rnd.randint(1, 16)
                ops.append(("bb", nb, rnd.getrandbits(nb)))
        bw = BitWriter()
        enc = cabac.CabacEncoder(bw)
        for k, a, v in ops:
            if k == "r":
                enc.encode_bin(enc_ctx, a, v)
            elif k == "b":
                enc.encode_bypass(v)
            else:
                enc.encode_bypass_bits(v, a)
        enc.encode_terminate(1)
        bw.align_zero()
        dec = cabac.CabacDecoder(bw.getvalue(), 0)
        for k, a, v in ops:
            if k == "r":
                assert dec.decode_bin(dec_ctx, a) == v
            elif k == "b":
                assert dec.decode_bypass() == v
            else:
                assert dec.decode_bypass_bits(a) == v
        assert dec.decode_terminate() == 1
        assert enc_ctx == dec_ctx


def test_cabac_pcm_restart_alignment():
    rnd = random.Random(3)
    for _ in range(50):
        enc_ctx = [cabac.init_context_state(154, 26) for _ in range(4)]
        dec_ctx = list(enc_ctx)
        ops1 = [(rnd.randrange(4), rnd.randint(0, 1))
                for _ in range(rnd.randint(0, 60))]
        ops2 = [(rnd.randrange(4), rnd.randint(0, 1))
                for _ in range(rnd.randint(1, 60))]
        marker = bytes(rnd.randint(0, 255) for _ in range(rnd.randint(1, 9)))
        bw = BitWriter()
        enc = cabac.CabacEncoder(bw)
        for a, v in ops1:
            enc.encode_bin(enc_ctx, a, v)
        enc.encode_terminate(0)
        enc.encode_terminate(1)
        bw.align_zero()
        marker_at = len(bw.getvalue())
        for b in marker:
            bw.put(b, 8)
        enc.restart()
        for a, v in ops2:
            enc.encode_bin(enc_ctx, a, v)
        enc.encode_terminate(1)
        bw.align_zero()
        data = bw.getvalue()
        dec = cabac.CabacDecoder(data, 0)
        for a, v in ops1:
            assert dec.decode_bin(dec_ctx, a) == v
        assert dec.decode_terminate() == 0
        assert dec.decode_terminate() == 1
        assert dec.consumed_bytes() == marker_at
        dec.reinit((marker_at + len(marker)) * 8)
        for a, v in ops2:
            assert dec.decode_bin(dec_ctx, a) == v
        assert dec.decode_terminate() == 1
