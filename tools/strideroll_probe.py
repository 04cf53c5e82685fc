"""Probe: in-kernel lr_check via a stride-1 strided roll (VERDICT r5 #3).

pltpu.roll(v, 0, lanes, stride=1, stride_axis=sublanes) gives the FORWARD
shear G[l, x] = v[l, x - l] in one op (per-vreg shift spread is only 7,
within Mosaic's limit; the backward shear stride=W-1 is rejected:
"max shift in a vreg ... larger than the vreg's width").

That shear is the lr gather: with d_R broadcast over sublanes,
G[l, x] = d_R(x - l), so  valid(x) = onehot(l == d_L(x)) AND
|l - G| <= max_diff AND x >= l, reduced over sublanes — lr_check fully
inside the extraction kernel, deleting the 128-shift XLA select loop
(~0.33 ms/frame at KITTI).

Timings: rwta-only kernel vs rwta+lr kernel (the delta is the in-kernel
lr cost), each 376 rows x (128, 1248) i32, 8-iter in-jit loops.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from fsgm_tpu.ops.pallas.aggregate_tr import sub_min          # noqa: E402
from fsgm_tpu.ops.pallas.extract_tr import diag_min_packed, KILL  # noqa

L, W, H = 128, 1280, 376


def _semantics():
    """fwd shear: roll(v, 0, 1, stride=1, stride_axis=0)[l,x] == v[l, x-l]"""
    def kern(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 0, 1, stride=1, stride_axis=0)

    x = jnp.asarray(np.random.RandomState(0).randint(0, 1 << 20, (L, W),
                                                     dtype=np.int32))
    fwd = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((L, W), jnp.int32))(x)
    xn = np.asarray(x)
    want_f = np.stack([np.roll(xn[i], i) for i in range(L)])
    ok = bool((np.asarray(fwd) == want_f).all())
    print("fwd shear exact:", ok)
    return ok


def _time(fn, x, iters=8):
    run = jax.jit(lambda s, v: jax.lax.fori_loop(
        0, iters, lambda i, a: a + fn(v + (s + i)), jnp.int32(0)))
    float(run(jnp.int32(255), x))
    t0 = time.perf_counter()
    float(run(jnp.int32(1), x))
    return (time.perf_counter() - t0) / iters * 1e3


def make(with_lr):
    n_out = 2 if with_lr else 1

    def kernel(s_ref, *o_refs):
        d_ref = o_refs[0]
        sub = jax.lax.broadcasted_iota(jnp.int32, (L, W), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (L, W), 1)
        for r in range(8):
            v = s_ref[r].astype(jnp.int32)
            packed = (v << 8) | sub
            pm = sub_min(packed)
            d = pm & 255
            rho = diag_min_packed(packed, W) & 255      # (1, W) right WTA
            d_ref[r] = rho
            if with_lr:
                g = pltpu.roll(jnp.broadcast_to(rho, (L, W)), 0, 1,
                               stride=1, stride_axis=0)  # g[l,x]=rho[x-l]
                bad = ((jnp.abs(sub - g) > 1) | (lane < sub))
                ck = jnp.where(sub == d, bad.astype(jnp.int32), 1)
                o_refs[1][r] = 1 - sub_min(ck)          # valid (1, W)

    def call(x):
        return pl.pallas_call(
            kernel, grid=(H // 8,),
            in_specs=[pl.BlockSpec((8, L, W), lambda i: (i, 0, 0))],
            out_specs=[pl.BlockSpec((8, 1, W), lambda i: (i, 0, 0))] * n_out,
            out_shape=[jax.ShapeDtypeStruct((H, 1, W), jnp.int32)] * n_out,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(x)
    return call


def main():
    if not _semantics():
        return
    x = jnp.asarray(np.random.RandomState(1).randint(
        0, 1 << 15, (H, L, W), dtype=np.int32))
    # exactness of the in-kernel valid vs the XLA shift-select lr_check
    rho, valid = make(True)(x)
    d_l = np.asarray(jnp.argmin(x, axis=1))
    rho_n = np.asarray(rho)[:, 0, :]
    want = np.zeros((H, W), bool)
    for y in range(H):
        for xx in range(W):
            d = d_l[y, xx]
            if xx - d >= 0 and abs(int(d) - int(rho_n[y, xx - d])) <= 1:
                want[y, xx] = True
    got = np.asarray(valid)[:, 0, :] != 0
    print("in-kernel lr valid exact:", bool((got == want).all()))
    for name, wl in (("rwta", False), ("rwta+lr", True),
                     ("rwta", False), ("rwta+lr", True)):
        t = _time(lambda v, f=make(wl): sum(o.sum() for o in
                                            (f(v) if wl else [f(v)[0]])), x)
        print(f"{name}: {t:.3f} ms/volume")


if __name__ == "__main__":
    main()
