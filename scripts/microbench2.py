"""Bisect the external-product composition cliff."""

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


def slope_time(body, x, k=4, reps=3, label=""):
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


rng = np.random.default_rng(0)
ct = jax.device_put(
    jnp.asarray(rng.integers(-(2**16), 2**16, size=(256, 2, 3, N)), jnp.int32), tpu)
gg = jax.device_put(
    jnp.asarray(rng.integers(-(2**18), 2**18, size=(P, 3, 2, 2, 4, N)), jnp.int32), tpu)


def stage(upto):
    def body(xx, c):
        x = xx + (c & 1)
        dig_ntt = ntt_fwd(ctx, x)  # [P, 256, 2, 3, N]
        if upto == "fwd":
            return jnp.sum(dig_ntt)
        p, ip = ctx.consts(5)
        acc = jnp.zeros((P, 256, 2, 4, N), jnp.int32)
        for cc in range(2):
            for d in range(3):
                dig = dig_ntt[:, :, cc, d][:, :, None, None, :]
                g2 = gg[:, d, cc].reshape(P, 1, 2, 4, N)
                acc = acc + mul_mod(dig, g2, p, ip)
        acc = reduce_once(acc, p, ip)
        if upto == "pw":
            return jnp.sum(acc)
        conv = ntt_inv(ctx, acc)
        if upto == "inv":
            return jnp.sum(conv)
        out = crt_fold(ctx.primes, conv, 17, 3, p, ip)
        if upto == "fold":
            return jnp.sum(out)
        return jnp.sum(limb_ops.normalize(out))

    return body


for s in ["fwd", "pw", "inv", "fold", "norm"]:
    slope_time(stage(s), ct, label=f"upto {s}")
