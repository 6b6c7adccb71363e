"""Single-probe per-layer / e2e timing harness (one JSON line per run).

Each invocation runs ONE probe in a fresh process so an OOM or crash cannot
poison later probes (the axon tunnel's device grant goes bad after a failed
allocation). Usage:

    python tools/probe_layer.py pallas:L12 [batch]
    python tools/probe_layer.py xla:L18 [batch]       # XLA s16 int32-accum conv
    python tools/probe_layer.py e2e:pallas [batch]
    python tools/probe_layer.py e2e:int32 [batch]
    python tools/probe_layer.py pool:tiny [batch]     # overlapping s1 maxpool

Timing: warm, then median of 3 x 5 dispatches
with one scalar readback (the tunnel's block_until_ready returns early), RPC
floor subtracted.
"""

from __future__ import annotations

import functools
import os
import sys

# tools/ scripts run as `python tools/x.py` (sys.path[0] = tools/);
# make the repo root importable regardless of cwd/PYTHONPATH
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import sys
import time

import numpy as np


def main() -> int:
    what = sys.argv[1]
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)

    from yolotpu.models import yolov2 as m
    from yolotpu.models import zoo
    from yolotpu.ops import convops
    from yolotpu.ops import pallas_q16 as q16
    from yolotpu.quant import calibrate_activations, quantize_weights
    from yolotpu.weights import WeightStore

    def floor_ms():
        f = jax.jit(lambda v: v + 1.0)
        _ = float(f(jnp.float32(0)))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = float(f(jnp.float32(0)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    rng = np.random.default_rng(0)
    spec = zoo.build("yolov2")
    store = WeightStore.synthetic(spec, seed=0)
    calib = [rng.random((3, 416, 416), dtype=np.float32)]
    act_q = calibrate_activations(spec, store, calib)
    quantize_weights(store, act_q)
    plan = m.Int16Plan.build(spec, store.qtables)
    convs = {f"L{l.idx:02d}": l for l in spec.conv_layers()}

    FLOOR = floor_ms()
    print(f"# rpc floor {FLOOR:.1f} ms; artifacts ready; compiling...",
          file=sys.stderr, flush=True)

    def timed(fn, xs, n_items=1, ops=None, name="?", reps=4):
        """reps * len(xs) dispatches per sync so device time dwarfs the
        ~40 ms RPC window (runs shorter than the round-trip otherwise
        hide inside it and report ~0)."""
        t0 = time.perf_counter()
        out = fn(xs[0])
        _ = float(jnp.sum(out.astype(jnp.float32))) if hasattr(out, "astype") \
            else float(jnp.sum(out["obj"]))
        comp = time.perf_counter() - t0

        def run_all():
            # accumulate sums without holding outputs alive (reps * |xs|
            # big activations would otherwise exhaust HBM)
            tot = None
            for _ in range(reps):
                for x in xs:
                    o = fn(x)
                    v = o if hasattr(o, "astype") else o["obj"]
                    s = jnp.sum(v.astype(jnp.float32))
                    tot = s if tot is None else tot + s
            return float(tot)

        _ = run_all()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = run_all()
            ts.append(time.perf_counter() - t0)
        ms = max(1e-6,
                 (float(np.median(ts)) * 1e3 - FLOOR) / (reps * len(xs)))
        rec = {"probe": name, "B": B, "ms": round(ms, 3),
               "compile_s": round(comp, 1)}
        if ops:
            rec["useful_tops"] = round(ops / (ms * 1e-3) / 1e12, 1)
        print(json.dumps(rec), flush=True)

    def variants(x, n=5):
        one = jnp.ones((), x.dtype)
        return [x.at[(0,) * x.ndim].add(one * i) for i in range(n)]

    kind, _, arg = what.partition(":")

    if kind in ("pmm", "xlamm"):
        # 3x3/s1 conv as XLA-built im2col patches + matmul (pallas q16 or
        # XLA s16 dot) — candidate formulation for the small-spatial layers
        l = convs[arg]
        ops = 2.0 * B * l.out_h * l.out_w * l.n * l.c * 9
        w16, b16 = store.int16[l.idx]
        shift_bias = store.qtables.bias_q[
            [c.idx for c in spec.conv_layers()].index(l.idx)] \
            - plan.conv_qa_out[l.idx]
        bias = m._round_shift_np(b16.astype(np.int64),
                                 shift_bias).astype(np.int32)
        shift = plan.conv_shift_out[l.idx]
        whwio = np.ascontiguousarray(w16.transpose(2, 3, 1, 0))
        xi = jnp.asarray(rng.integers(
            -32768, 32768, (B, l.h, l.w, l.c)).astype(np.int16))
        if kind == "pmm":
            wp = q16.prep_matmul_weights(
                whwio.reshape(9 * l.c, l.n), bias)

            def fn_(v):
                pq = m._patches3x3(v)
                o = q16.matmul_q16_requant(
                    pq.reshape(-1, pq.shape[-1]), wp, shift,
                    l.activation == "leaky", out_np=True)
                return o
            fn = jax.jit(fn_)
        else:
            wj = jnp.asarray(whwio.reshape(9 * l.c, l.n))
            bj = jnp.asarray(bias)

            def fn_(v):
                pq = m._patches3x3(v)
                acc = jnp.dot(pq.reshape(-1, 9 * l.c), wj,
                              preferred_element_type=jnp.int32)
                o = convops.sat16(convops.round_shift(acc, shift) + bj)
                if l.activation == "leaky":
                    o = convops.sat16(convops.leaky_int16(o))
                return o.astype(jnp.int16)
            fn = jax.jit(fn_)
        timed(fn, variants(xi), ops=ops, name=f"{kind}:{arg}")
        return 0

    if kind == "pflat":
        # flat-band conv kernel on any 3x3 layer (builds conv3 weights
        # directly, independent of params_q16's per-layer kind selection)
        l = convs[arg]
        w16, b16 = store.int16[l.idx]
        shift_bias = store.qtables.bias_q[
            [c.idx for c in spec.conv_layers()].index(l.idx)] \
            - plan.conv_qa_out[l.idx]
        bias = m._round_shift_np(b16.astype(np.int64),
                                 shift_bias).astype(np.int32)
        whwio = np.ascontiguousarray(w16.transpose(2, 3, 1, 0))
        wp = q16.prep_conv_weights(whwio, bias)
        shift = plan.conv_shift_out[l.idx]
        leaky = l.activation == "leaky"
        ops = 2.0 * B * l.out_h * l.out_w * l.n * l.c * 9
        xi = jnp.asarray(rng.integers(
            -32768, 32768, (B, l.h, l.w, wp["Cp"])).astype(np.int16))
        fn = jax.jit(functools.partial(
            q16.conv3x3_q16_flat, wp=wp, shift_out=shift, leaky=leaky))
        probe_out = fn(xi)
        assert probe_out is not None, "no flat geometry"
        timed(fn, variants(xi), ops=ops, name=f"pflat:{arg}")
        return 0

    if kind == "p2f":
        # flat-band p2 kernel on a small-C 3x3 layer (input pre-packed)
        l = convs[arg]
        w16, b16 = store.int16[l.idx]
        shift_bias = store.qtables.bias_q[
            [c.idx for c in spec.conv_layers()].index(l.idx)] \
            - plan.conv_qa_out[l.idx]
        bias = m._round_shift_np(b16.astype(np.int64),
                                 shift_bias).astype(np.int32)
        whwio = np.ascontiguousarray(w16.transpose(2, 3, 1, 0))
        wp = q16.prep_conv_weights_p2(whwio, bias)
        shift = plan.conv_shift_out[l.idx]
        leaky = l.activation == "leaky"
        ops = 2.0 * B * l.out_h * l.out_w * l.n * l.c * 9
        xi = jnp.asarray(rng.integers(
            -32768, 32768, (B, l.h // 2, l.w // 2, 4 * l.c)
        ).astype(np.int16))
        fn = jax.jit(functools.partial(
            q16.conv3x3p2f_q16_requant, wp=wp, shift_out=shift,
            leaky=leaky))
        assert fn(xi) is not None, "no p2f geometry"
        timed(fn, variants(xi), ops=ops, name=f"p2f:{arg}")
        return 0

    if kind in ("pallas", "xla"):
        l = convs[arg]
        if kind == "pallas" and l.size == 3 and \
                f"{l.idx}:" not in os.environ.get("YOLO2_Q16_PLAN", ""):
            # standalone pallas probe of a layer the default plan routes
            # to xla: force the conv3 kernel so the probe measures it
            os.environ["YOLO2_Q16_PLAN"] = ",".join(filter(None, [
                os.environ.get("YOLO2_Q16_PLAN", ""), f"{l.idx}:conv3"]))
        params = m.params_q16(spec, store)
        pw = params[f"conv{l.idx}"]
        shift = plan.conv_shift_out[l.idx]
        leaky = l.activation == "leaky"
        ops = 2.0 * B * l.out_h * l.out_w * l.n * l.c * l.size * l.size
        if kind == "xla":
            w16, b16 = store.int16[l.idx]
            shift_bias = store.qtables.bias_q[
                [c.idx for c in spec.conv_layers()].index(l.idx)] \
                - plan.conv_qa_out[l.idx]
            bias = m._round_shift_np(b16.astype(np.int64),
                                     shift_bias).astype(np.int32)
            wj = jnp.asarray(np.ascontiguousarray(w16.transpose(2, 3, 1, 0)))
            bj = jnp.asarray(bias)
            xi = jnp.asarray(rng.integers(
                -32768, 32768, (B, l.h, l.w, l.c)).astype(np.int16))
            fn = jax.jit(lambda v: convops.conv_int16(
                v, wj, bj, l.stride, l.pad, l.activation, shift, "int32"))
            timed(fn, variants(xi), ops=ops, name=f"xla:{arg}")
            return 0
        if pw["kind"] == "mm":
            cin = pw["wp"]["Kp"]
            xi = jnp.asarray(rng.integers(
                -32768, 32768, (B, l.h, l.w, cin)).astype(np.int16))
            fn = jax.jit(lambda v: q16.matmul_q16_requant(
                v.reshape(-1, v.shape[-1]), pw["wp"], shift, leaky,
                out_np=True))
        elif pw["kind"] == "conv3":
            cin = pw["wp"]["Cp"]
            xi = jnp.asarray(rng.integers(
                -32768, 32768, (B, l.h, l.w, cin)).astype(np.int16))
            fn = jax.jit(functools.partial(
                q16.conv3x3_q16_requant, wp=pw["wp"], shift_out=shift,
                leaky=leaky, out_np=True))
        elif pw["kind"] == "conv3p2":
            cin = pw["wp"]["C"]
            xi = jnp.asarray(rng.integers(
                -32768, 32768, (B, l.h // 2, l.w // 2, 4 * cin)
            ).astype(np.int16))
            fn = jax.jit(functools.partial(
                q16.conv3x3p2_q16_requant, wp=pw["wp"], shift_out=shift,
                leaky=leaky))
        elif pw["kind"] == "mm_pairs":
            xi = jnp.asarray(rng.random(
                (B, l.h, l.w, l.c), dtype=np.float32))

            def fn_(v):
                pf = m._patches3x3_pairs(v)
                pq = convops.quantize_input_int16(pf, plan.input_q)
                return q16.matmul_q16_requant(
                    pq.reshape(-1, pq.shape[-1]), pw["wp"], shift, leaky)
            fn = jax.jit(fn_)
        else:  # mm_patches
            xi = jnp.asarray(rng.integers(
                -32768, 32768, (B, l.h, l.w, l.c)).astype(np.int16))

            def fn_(v):
                pq = m._patches3x3(v)
                return q16.matmul_q16_requant(
                    pq.reshape(-1, pq.shape[-1]), pw["wp"], shift, leaky)
            fn = jax.jit(fn_)
        timed(fn, variants(xi), ops=ops, name=f"pallas[{pw['kind']}]:{arg}")
        return 0

    if kind == "prefix":
        # time a truncated prefix of the graph (layers 0..n-1) end to end:
        # "prefix:12:int32" / "prefix:12:pallas"
        nlayers, _, compute = arg.partition(":")
        nlayers = int(nlayers)
        from yolotpu.graph import NetworkSpec
        from yolotpu.models.zoo import MODELS
        from yolotpu.cfg import Section
        mdef = MODELS["yolov2"]
        sections = [Section(type="net", line=0, options={
            "width": "416", "height": "416", "channels": "3"})]
        for i, (t, opts) in enumerate(mdef["layers"][:nlayers], start=1):
            sections.append(Section(type=t, line=i, options=dict(opts)))
        pspec = NetworkSpec.from_sections(sections, batch=1)
        pstore = WeightStore.synthetic(pspec, seed=0)
        pcal = [rng.random((3, 416, 416), dtype=np.float32)]
        pq = calibrate_activations(pspec, pstore, pcal)
        quantize_weights(pstore, pq)
        if compute == "pallas":
            pparams = m.params_q16(pspec, pstore)
        else:
            pparams = m.params_int16(pspec, pstore)
        pfwd = m.build_forward(pspec, "int16", pstore.qtables,
                               compute=compute, outputs=("head",))
        fn = jax.jit(lambda v: pfwd(pparams, v)["head"])
        xe = jnp.asarray(rng.random((B, 416, 416, 3), dtype=np.float32))
        xs = [xe + jnp.float32(i) * 1e-6 for i in range(8)]
        t0 = time.perf_counter()
        _ = float(jnp.sum(fn(xs[0])))
        comp = time.perf_counter() - t0

        def run_all():
            tot = None
            for x in xs:
                s = jnp.sum(fn(x))
                tot = s if tot is None else tot + s
            return float(tot)

        _ = run_all()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = run_all()
            ts.append(time.perf_counter() - t0)
        ms = (float(np.median(ts)) * 1e3 - FLOOR) / len(xs)
        print(json.dumps({"probe": f"prefix{nlayers}:{compute}", "B": B,
                          "ms_per_step": round(ms, 2),
                          "compile_s": round(comp, 1)}), flush=True)
        return 0

    if kind == "e2e":
        compute = arg
        if compute == "int8":
            # w8a8 turbo tier end-to-end (VERDICT r3 item 8)
            from yolotpu.quant import (calibrate_activations_int8,
                                       quantize_weights_int8)
            act_q8 = calibrate_activations_int8(spec, store, calib)
            quantize_weights_int8(store, act_q8)
            params = m.params_int8(spec, store, pallas=True)
            fwd = m.build_forward(spec, "int8", store.qtables8,
                                  compute="pallas",
                                  outputs=("head", "boxes"))
        elif compute in ("w8a16", "w8a16p"):
            # per-channel int8 weights x int16 activations: "w8a16" = XLA
            # batch-stacked-plane convs (ops/convops.conv_w8a16); "w8a16p"
            # = Pallas engines (weight-resident conv3 + fused 1x1 matmul)
            from yolotpu.quant import quantize_weights_w8a16
            quantize_weights_w8a16(store, store.qtables.act_q)
            pall = compute == "w8a16p"
            params = m.params_w8a16(spec, store, pallas=pall)
            fwd = m.build_forward(spec, "w8a16", store.qtables_w8,
                                  compute=("pallas" if pall else "int32"),
                                  outputs=("head", "boxes"))
        elif compute == "pallas":
            params = m.params_q16(spec, store)
        else:
            params = m.params_int16(spec, store)
        if compute not in ("int8", "w8a16", "w8a16p"):
            fwd = m.build_forward(spec, "int16", store.qtables,
                                  compute=compute,
                                  outputs=("head", "boxes"))
        fn = jax.jit(lambda v, p=params, f=fwd: f(p, v))
        xe = jnp.asarray(rng.random((B, 416, 416, 3), dtype=np.float32))
        xs = [xe + jnp.float32(i) * 1e-6 for i in range(8)]
        t0 = time.perf_counter()
        _ = float(jnp.sum(fn(xs[0])["obj"]))
        comp = time.perf_counter() - t0

        def run_all():
            outs = [fn(v)["obj"] for v in xs]
            return float(jnp.sum(jnp.stack([jnp.sum(o) for o in outs])))

        _ = run_all()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = run_all()
            ts.append(time.perf_counter() - t0)
        ms = (float(np.median(ts)) * 1e3 - FLOOR) / len(xs)
        print(json.dumps({"probe": f"e2e:{compute}", "B": B,
                          "ms_per_step": round(ms, 2),
                          "fps": round(B / (ms * 1e-3), 1),
                          "compile_s": round(comp, 1)}), flush=True)
        return 0

    if kind == "decomp":
        # One-step bench decomposition (STATUS reconciliation table):
        # times the uint8 prologue, the backbone (head only), the boxes
        # epilogue, and the full bench-shaped program, all floor-subtracted.
        compute = arg or "pallas"
        params = (m.params_q16(spec, store) if compute == "pallas"
                  else m.params_int16(spec, store))
        xu8 = jnp.asarray(rng.integers(
            0, 256, (B, 416, 416, 3)).astype(np.uint8))

        def prologue(v):
            xf = v.astype(jnp.float32) / 255.0
            return convops.quantize_input_int16(xf, plan.input_q)
        timed(jax.jit(prologue), variants(xu8), name="decomp:prologue")

        fwd_h = m.build_forward(spec, "int16", store.qtables,
                                compute=compute, outputs=("head",))
        fh = jax.jit(lambda v: fwd_h(params, v)["head"])
        timed(fh, variants(xu8), name="decomp:head_only")

        from yolotpu.ops import region as region_ops
        head = jnp.asarray(rng.random(
            (B, 13, 13, 425), dtype=np.float32))

        def boxes_ep(hv):
            b_, o_, p_ = region_ops.decode_region(hv, spec.region)
            return o_
        timed(jax.jit(boxes_ep), variants(head), name="decomp:boxes_epi")

        fwd_full = m.build_forward(spec, "int16", store.qtables,
                                   compute=compute,
                                   outputs=("head", "boxes"))
        ff = jax.jit(lambda v: fwd_full(params, v))
        timed(ff, variants(xu8), name="decomp:full")
        return 0

    if kind in ("entryf", "entryfprep", "entryfdot"):
        # isolate the fused-entry cost: full forward vs XLA-side prep only
        l = convs["L00"]
        w16, b16 = store.int16[l.idx]
        shift_bias = store.qtables.bias_q[0] - plan.conv_qa_out[l.idx]
        bias = m._round_shift_np(b16.astype(np.int64),
                                 shift_bias).astype(np.int32)
        whwio = np.ascontiguousarray(w16.transpose(2, 3, 1, 0))
        wp = q16.prep_entryf_weights(whwio, bias)
        shift = plan.conv_shift_out[l.idx]
        # merged (H, W*C) dense-lane input — a 3-lane tensor is ~42x
        # physically padded on TPU and poisons any measurement
        xi = jnp.asarray(rng.integers(
            0, 16000, (B, l.h, l.w * l.c)).astype(np.int16))
        ops = 2.0 * B * l.out_h * l.out_w * l.n * l.c * 9
        if kind == "entryf":
            fn = jax.jit(lambda v: q16.entryf_forward(v, wp, shift, True))
            timed(fn, variants(xi), ops=ops, name="entryf:full")
        elif kind == "entryfdot":
            # prep + kernel, no output crop/reshape (sum the raw kernel out)
            def fn_(v):
                o = q16.entryf_forward(v, wp, shift, True)
                return o
            fn = jax.jit(fn_)
            timed(fn, variants(xi), ops=ops, name="entryf:dot")
        else:
            def prep(v):
                H, W, C = l.h, l.w, l.c
                NG = W // 8 + 2
                xr = jnp.pad(v, ((0, 0), (1, 1),
                                 (C, (8 * NG - W - 1) * C)))
                xv = xr.reshape(B, H + 2, NG, 8 * C)
                xv = jnp.pad(xv, ((0, 0), (0, 0), (0, 0),
                                  (0, 128 - 8 * C)))
                xh, xl = q16.split16(xv)
                return (jnp.sum(xh.astype(jnp.int32))
                        + jnp.sum(xl.astype(jnp.int32)))
            fn = jax.jit(prep)
            timed(fn, variants(xi), name="entryf:prep")
        return 0

    if kind == "pool":
        # yolov2-tiny's overlapping stride-1 maxpool (int16)
        from yolotpu.ops import pool as pool_ops
        xi = jnp.asarray(rng.integers(
            -32768, 32768, (B, 13, 13, 512)).astype(np.int16))
        fn = jax.jit(lambda v: pool_ops.maxpool(v, 2, 1, 1))
        timed(fn, variants(xi), name="pool:tiny_s1")
        xi2 = jnp.asarray(rng.integers(
            -32768, 32768, (B, 416, 416, 32)).astype(np.int16))
        fn2 = jax.jit(lambda v: pool_ops.maxpool(v, 2, 2, 0))
        timed(fn2, variants(xi2), name="pool:s2_416")
        return 0

    raise SystemExit(f"unknown probe {what!r}")


if __name__ == "__main__":
    sys.exit(main())
