"""True multi-PROCESS validation of the sharded matcher (CPU, Gloo).

The test suite runs the sharded path on 8 virtual devices inside ONE
process; this check exercises the real multihost structure instead:
N separate processes, `jax.distributed.initialize` (the path
`parallel.initialize_multihost` / the CLI use on pods), a global mesh
spanning the processes' devices, and evolve_sharded's top-mu merge
collectives crossing PROCESS boundaries over XLA's Gloo CPU transport —
the single-machine analog of DCN between hosts (docs/DISTRIBUTED.md).

Parent mode spawns the children and asserts every process computed the
same (replicated) result:

    python tools/multiprocess_check.py            # 2 procs x 4 devices
    python tools/multiprocess_check.py --procs 4 --devs 2
    python tools/multiprocess_check.py --procs 4 --devs 2 --mesh2d
        # 2-D (pop x frame) mesh spanning the processes: population shards
        # AND STFT-frame shards both cross process boundaries (the psum of
        # framewise fitness partials rides the same transport as the top-mu
        # all-gather)
"""
import argparse
import os
import socket
import subprocess
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def child(pid: int, nproc: int, ndev: int, port: int, mesh2d: bool,
          timeit: bool = False) -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from pmfm_tpu.parallel import initialize_multihost

    initialize_multihost(f"127.0.0.1:{port}", nproc, pid)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    from pmfm_tpu.es import ESConfig, init_state, make_spectrum_ops
    from pmfm_tpu.parallel import make_mesh
    from pmfm_tpu.parallel.mesh import FRAME_AXIS, POP_AXIS
    from pmfm_tpu.parallel.sharded import evolve_sharded

    ndev_global = jax.device_count()
    assert ndev_global == nproc * ndev, (ndev_global, nproc, ndev)
    frames = 1
    if mesh2d:
        # 2-D (pop x frame) mesh spanning processes: with the default
        # device order, every frame-axis pair spans two different processes
        frame_shards = 2
        mesh = make_mesh(shape=(ndev_global // frame_shards, frame_shards),
                         axis_names=(POP_AXIS, FRAME_AXIS))
        frames = frame_shards
    else:
        mesh = make_mesh()  # all global devices on the pop axis
    n_pop_shards = int(mesh.shape[POP_AXIS])
    cfg = ESConfig(
        num_parents=4, num_offspring=4 * n_pop_shards - 4, num_dimensions=6,
        topology="fm3_series", audio_length_log2=6,
        synthesis_engine="scanless", num_frames=frames,
    )
    so = make_spectrum_ops(cfg)
    # identical-on-every-process inputs, explicitly replicated on the mesh
    rep = NamedSharding(mesh, PartitionSpec())
    state = jax.device_put(init_state(jax.random.PRNGKey(0), cfg), rep)
    tshape = (frames, so.num_bins) if frames > 1 else (so.num_bins,)
    tspec = jax.device_put(jnp.ones(tshape, jnp.float32), rep)

    @jax.jit
    def run(s, t):
        final, _ = evolve_sharded(s, t, 3, so, cfg, mesh)
        return final.best_fitness, final.parent_fitness

    bf, pf = jax.block_until_ready(run(state, tspec))
    print(f"MPCHK {pid} best={float(bf):.9e} gen_ok=1 "
          f"p0={float(pf.addressable_shards[0].data.reshape(-1)[0]):.9e}",
          flush=True)

    if timeit and not mesh2d:
        # Merge-collective wall-clock share (VERDICT r2 #5): time the
        # sharded evolve against a local-only evolve doing the same
        # per-shard work (same local population, same mu) with NO
        # collective. Gloo-on-CPU numbers say nothing about ICI latency —
        # this measures the STRUCTURAL overhead (collective count/payload
        # + replicated merge) of the design at a real process boundary.
        import time as _time

        gens = 20
        mu = 16
        local_pop = 1024
        cfg_t = ESConfig(
            num_parents=mu, num_offspring=local_pop * n_pop_shards - mu,
            num_dimensions=6, topology="fm3_series", audio_length_log2=9,
            synthesis_engine="scanless",
        )
        so_t = make_spectrum_ops(cfg_t)
        st = jax.device_put(init_state(jax.random.PRNGKey(1), cfg_t), rep)
        tg = jax.device_put(jnp.ones((so_t.num_bins,), jnp.float32), rep)

        @jax.jit
        def run_shard(s, t):
            final, _ = evolve_sharded(s, t, gens, so_t, cfg_t, mesh)
            return final.best_fitness

        from pmfm_tpu.es.pipeline import evolve as evolve_local

        cfg_l = cfg_t.replace(num_offspring=local_pop - mu)
        st_l = init_state(jax.random.PRNGKey(1), cfg_l)

        @jax.jit
        def run_local(s, t):
            final, _ = evolve_local(s, t, gens, so_t, cfg_l)
            return final.best_fitness

        def best_of(f, *a, reps=3):
            jax.block_until_ready(f(*a))
            out = None
            for _ in range(reps):
                t0 = _time.perf_counter()
                jax.block_until_ready(f(*a))
                dt = _time.perf_counter() - t0
                out = dt if out is None else min(out, dt)
            return out

        t_shard = best_of(run_shard, st, tg)
        t_local = best_of(run_local, st_l, tg)
        share = max(0.0, 1.0 - t_local / t_shard)
        print(
            f"MPTIME {pid} gens={gens} local_pop={local_pop} "
            f"t_sharded={t_shard*1e3/gens:.3f}ms/gen "
            f"t_local={t_local*1e3/gens:.3f}ms/gen "
            f"merge_share={share*100:.1f}%",
            flush=True,
        )
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--devs", type=int, default=4, help="virtual devices per process")
    ap.add_argument("--mesh2d", action="store_true",
                    help="2-D (pop x frame) mesh spanning the processes")
    ap.add_argument("--timeit", action="store_true",
                    help="also time sharded vs local-only evolve per child "
                         "(merge-collective wall-clock share)")
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    args = ap.parse_args()
    if args.child is not None:
        return child(args.child, args.procs, args.devs, args.port,
                     args.mesh2d, args.timeit)

    port = _free_port()  # per-invocation: concurrent runs don't collide
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devs}"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--procs",
             str(args.procs), "--devs", str(args.devs), "--child", str(i),
             "--port", str(port)]
            + (["--mesh2d"] if args.mesh2d else [])
            + (["--timeit"] if args.timeit else []),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(args.procs)
    ]
    try:
        outs = [p.communicate(timeout=480)[0] for p in procs]
    finally:
        for p in procs:  # no orphans on timeout/failure (they would hold
            if p.poll() is None:  # the coordinator port and burn CPU)
                p.kill()
    lines = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(out)
            print(f"child {i} FAILED rc={p.returncode}")
            return 1
        lines += [ln for ln in out.splitlines()
                  if ln.startswith(("MPCHK", "MPTIME"))]
    print("\n".join(lines))
    tlines = [ln for ln in lines if ln.startswith("MPTIME")]
    lines = [ln for ln in lines if ln.startswith("MPCHK")]
    bests = {ln.split("best=")[1].split()[0] for ln in lines}
    assert len(lines) == args.procs, lines
    assert len(bests) == 1, f"processes disagree: {bests}"
    print(f"OK: {args.procs} processes x {args.devs} devices"
          f"{' (2-D pop x frame mesh)' if args.mesh2d else ''}, "
          f"replicated best fitness identical across processes ({bests.pop()})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
