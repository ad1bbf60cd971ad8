"""Microbenchmarks of the hot pipeline pieces at 2^18-read shapes, using
the scan-slope methodology (k reps inside one jit, scalar fetch).

Each body's full output is folded into the scan carry via jnp.sum so XLA
cannot dead-code-eliminate the work."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from fhe_ram_tpu.params import PARAMS_README_2_18 as par
from fhe_ram_tpu.ops.ntt import get_ntt_context, ntt_fwd, ntt_inv
from fhe_ram_tpu.ops.modular import mul_mod, reduce_once
from fhe_ram_tpu.ops.crt import crt_fold
from fhe_ram_tpu.ops import limb as limb_ops

ctx = get_ntt_context(par.n, par.primes)
tpu = jax.devices()[0]
N = par.n
P = par.num_primes


def slope_time(body, x, k=8, reps=3, label=""):
    """ms per body(x, carry) application; body returns int32 scalar."""

    def fn_k(kk):
        def f(xx):
            def sbody(c, _):
                return c + body(xx, c), None

            c, _ = jax.lax.scan(sbody, jnp.zeros((), jnp.int32), None, length=kk)
            return c

        return jax.jit(f)

    f1, fk = fn_k(1), fn_k(k)
    np.asarray(f1(x)); np.asarray(fk(x))
    ts1, tsk = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f1(x)); ts1.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(fk(x)); tsk.append(time.perf_counter() - t0)
    ms = (min(tsk) - min(ts1)) / (k - 1) * 1000
    print(f"{label}: {ms:.1f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)

    B_fwd = 4 * 64 * 2 * 3   # level-0 fwd polys (rows*subrams*comps*digits)
    B_inv = 4 * 64 * 2 * 4   # level-0 inv polys (rows*subrams*comps*key limbs)

    x = jax.device_put(
        jnp.asarray(rng.integers(-(2**16), 2**16, size=(B_fwd, N)), jnp.int32), tpu)
    slope_time(lambda xx, c: jnp.sum(ntt_fwd(ctx, xx + (c & 1))),
               x, label=f"fwd NTT [{B_fwd},{N}]x{P}p")

    r = jax.device_put(
        jnp.asarray(rng.integers(-(2**18), 2**18, size=(P, B_inv, N)), jnp.int32), tpu)
    slope_time(lambda xx, c: jnp.sum(ntt_inv(ctx, xx + (c & 1))),
               r, label=f"inv NTT [{P},{B_inv},{N}]")

    dig = jax.device_put(
        jnp.asarray(rng.integers(-(2**18), 2**18, size=(P, 256, 2, 3, N)), jnp.int32), tpu)
    g = jax.device_put(
        jnp.asarray(rng.integers(-(2**18), 2**18, size=(P, 3, 2, 2, 4, N)), jnp.int32), tpu)

    def body_pw(xx, c):
        p, ip = ctx.consts(5)
        acc = jnp.zeros((P, 256, 2, 4, N), jnp.int32)
        for cc in range(2):
            for d in range(3):
                acc = acc + mul_mod(xx[:, :, cc, d, None, None, :] + (c & 1),
                                    g[:, d, cc].reshape(P, 1, 2, 4, N), p, ip)
        return jnp.sum(reduce_once(acc, p, ip))

    slope_time(body_pw, dig, label="pointwise VMP level0 (256 rows)")

    conv = jax.device_put(
        jnp.asarray(rng.integers(-(2**18), 2**18, size=(P, B_inv, N)), jnp.int32), tpu)

    def body_garner(xx, c):
        p, ip = ctx.consts(3)
        out = crt_fold(ctx.primes, xx.reshape(P, -1, 4, N) + (c & 1), 17, 3, p2, ip2)
        return jnp.sum(limb_ops.normalize(out))

    p2, ip2 = ctx.consts(4)
    slope_time(body_garner, conv, label=f"garner+fold [{P},{B_inv//4},4,{N}]")

    # one full level-0 chain step (external product batched over 256 rows)
    from fhe_ram_tpu.core import ggsw as ggsw_mod
    ct = jax.device_put(
        jnp.asarray(rng.integers(-(2**16), 2**16, size=(256, 2, 3, N)), jnp.int32), tpu)
    gg = jax.device_put(
        jnp.asarray(rng.integers(-(2**18), 2**18, size=(P, 3, 2, 2, 4, N)), jnp.int32), tpu)
    slope_time(
        lambda xx, c: jnp.sum(ggsw_mod.external_product(par, ctx, xx + (c & 1), gg)),
        ct, k=4, label="full ext product step (256 rows)")

    # one trace step at final-trace shapes (batch 4)
    from fhe_ram_tpu.core import keyswitch
    ct4 = jax.device_put(
        jnp.asarray(rng.integers(-(2**16), 2**16, size=(4, 2, 3, N)), jnp.int32), tpu)
    key = jax.device_put(
        jnp.asarray(rng.integers(-(2**18), 2**18, size=(P, 3, 1, 2, 4, N)), jnp.int32), tpu)
    slope_time(
        lambda xx, c: jnp.sum(keyswitch.keyswitch(par, ctx, xx + (c & 1), key, 3)),
        ct4, label="one keyswitch step (batch 4)")


if __name__ == "__main__":
    main()
