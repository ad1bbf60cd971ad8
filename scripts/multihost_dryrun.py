"""Multi-process (multi-"host") dryrun on CPU: N processes, each with 2
virtual CPU devices, form a global (dp=N, rows=2) mesh; a batched
row-sharded encrypted read executes under GSPMD with cross-process
collectives; process 0 decrypt-checks every result.

This validates the multi-host path (jax.distributed init, global mesh,
make_array_from_callback sharding, DCN-axis batching) without a pod.

Usage (driver):    python scripts/multihost_dryrun.py            # spawns 2 workers
Usage (worker):    python scripts/multihost_dryrun.py --pid K --nproc N --port P
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOCAL_DEVICES = 2


def worker(pid: int, nproc: int, port: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={LOCAL_DEVICES}")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from fhe_ram_tpu.parallel import dist, mesh as mesh_mod
    from fhe_ram_tpu.params import PARAMS_TEST_SMALL as par
    from fhe_ram_tpu.ops.ntt import get_ntt_context
    from fhe_ram_tpu.core import glwe, keys, rng
    from fhe_ram_tpu.ram import address as address_mod, ram as ram_mod

    dist.init_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    m = dist.make_multihost_mesh()
    assert m.shape["dp"] == nproc * LOCAL_DEVICES // 2 and m.shape["rows"] == 2

    # identical client-side setup on every process (deterministic seed)
    ctx = get_ntt_context(par.n, par.primes)
    src = rng.Source(3)
    sk = rng.ternary_secret(src.split(), par.rank, par.n, par.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    ekp = keys.prepare(par, keys.keygen(par, sk, src))
    rnd = np.random.default_rng(11)
    data = rnd.integers(0, 256, size=par.max_addr * par.word_size).astype(np.uint8)
    ram_ct = ram_mod.encrypt_ram(par, ctx, s_ntt, data, src)

    B = m.shape["dp"]
    idxs = [int(rnd.integers(0, par.max_addr)) for _ in range(B)]
    aps = [address_mod.prepare(ctx, address_mod.encrypt(par, ctx, s_ntt, i, src))
           for i in idxs]
    coords_b = mesh_mod.stack_addresses(aps)

    # global shardings: data rows over ICI-analog axis, batch over DCN
    data_g = dist.shard_rows_global(m, np.asarray(ram_ct))
    coords_g = dist.host_local_batch(m, tuple(np.asarray(c) for c in coords_b))
    atk_g = dist.replicated_global(
        m, {g: np.asarray(k) for g, k in ekp.atk_glwe.items()})

    fn = mesh_mod.batched_read_fn(par, m)
    out = fn(data_g, coords_g, atk_g)
    jax.block_until_ready(out)

    # gather to every process for checking (fully replicated view)
    from jax.sharding import NamedSharding, PartitionSpec as P
    out_rep = jax.jit(lambda x: x,
                      out_shardings=NamedSharding(m, P()))(out)
    local = np.asarray(out_rep.addressable_data(0))

    ok = True
    for b, idx in enumerate(idxs):
        for i in range(par.word_size):
            want = glwe.cast_u8_signed(int(data[idx * par.word_size + i]), par.k_pt)
            ph = glwe.phase(par, ctx, s_ntt, jnp.asarray(local[b, i]))
            val, noise = glwe.decode_coeff0(par, np.asarray(ph), want)
            ok &= int(val) == want and noise < -(par.k_pt + 1)
    print(f"[process {pid}] mesh={dict(m.shape)} batch={B} "
          f"{'ALL CORRECT' if ok else 'WRONG'}", flush=True)
    if not ok:
        sys.exit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, default=None)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--port", type=int, default=29517)
    args = ap.parse_args()

    if args.pid is not None:
        worker(args.pid, args.nproc, args.port)
        return

    procs = []
    for pid in range(args.nproc):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--pid", str(pid),
             "--nproc", str(args.nproc), "--port", str(args.port)],
            env={**os.environ, "JAX_PLATFORMS": "cpu"}))
    rc = 0
    for p in procs:
        rc |= p.wait()
    print("multihost dryrun:", "OK" if rc == 0 else "FAILED", flush=True)
    sys.exit(rc)


if __name__ == "__main__":
    main()
