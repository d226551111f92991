"""Benchmark: mapping-optimizer throughput at the reference operating point.

Runs the full-size flagship training step (window 8 x (512 lidar + 64 sky)
rays = 4608 rays/iteration, 512 samples/ray, occupancy-grid importance
sampling) on the available accelerator and reports iterations/second.

Two variants are measured:
  * joint (freeze_poses=False): the reference's dominant steady-state phase
    (cfg/defaults.yaml keyframe_schedule: 50 joint its/KF) — poses get
    gradients through ray building. THIS IS THE HEADLINE NUMBER.
  * frozen (freeze_poses=True): the first-KF burn-in phase; the pose
    backward is compiled out.

Baseline: the reference publishes no numbers (BASELINE.md); its real-time
budget implies >= ~16.7 iterations/s (50 its per keyframe, one keyframe per
3 s). vs_baseline is the JOINT its/s against that real-time floor.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

REALTIME_FLOOR_ITS_PER_SEC = 50.0 / 3.0


def _measure(step, state, window, flags, pose_mask, n_iters=40, n_passes=3):
    """Median-of-passes rate. Both flag variants (occ update on/off) are
    warmed BEFORE timing — on a cold compilation cache the occ-update
    program otherwise compiles inside the first timed pass — and the
    median over n_passes rejects one-off timing artifacts observed on the
    remote backend (a single cold-cache run once reported an 80x-too-fast
    joint pass; warm reruns reproduce the true rate to <2%)."""
    import statistics

    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    occ_true = flags._replace(do_occ_update=jnp.asarray(True))
    # compile + warmup, both variants
    for f in (flags, occ_true):
        key, sub = jax.random.split(key)
        state, aux = step(state, window, sub, f, pose_mask, jnp.asarray(0))
        jax.block_until_ready(state.params)

    rates = []
    for _ in range(n_passes):
        t0 = time.perf_counter()
        for i in range(n_iters):
            key, sub = jax.random.split(key)
            f = occ_true if (i % 10 == 9) else flags
            state, aux = step(state, window, sub, f, pose_mask, jnp.asarray(i))
        jax.block_until_ready(state.params)
        rates.append(n_iters / (time.perf_counter() - t0))
    return statistics.median(rates), state


def main():
    import os

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the flagship step is a large program and
    # remote-compile backends take minutes on a cold cache
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship
    from loner_tpu.mapping.optimizer import TrainStepFlags, make_train_step

    cfg, cube, state, window = _flagship()
    # state is threaded linearly below -> donation is safe (and halves the
    # HBM held by the table + Adam-moment buffers)
    step = make_train_step(cfg, cube, donate=True)
    frozen_flags = TrainStepFlags(
        freeze_sigma=jnp.asarray(False),
        freeze_rgb=jnp.asarray(True),
        freeze_poses=jnp.asarray(True),
        do_occ_update=jnp.asarray(False),
    )
    joint_flags = frozen_flags._replace(freeze_poses=jnp.asarray(False))
    no_mask = jnp.zeros((cfg.max_keyframes,))
    all_mask = jnp.ones((cfg.max_keyframes,)).at[0].set(0.0)  # first KF anchored

    frozen_rate, state = _measure(step, state, window, frozen_flags, no_mask)
    joint_rate, state = _measure(step, state, window, joint_flags, all_mask)
    # physical invariant: the joint step does strictly more work than the
    # frozen one (the pose backward is compiled out of the latter), so a
    # faster joint rate can only be a measurement artifact -> remeasure
    for _ in range(2):
        if joint_rate <= frozen_rate * 1.05:
            break
        joint_rate, state = _measure(step, state, window, joint_flags, all_mask)

    print(
        json.dumps(
            {
                "metric": "mapper_iterations_per_sec_joint",
                "value": round(joint_rate, 2),
                "unit": (
                    "it/s (4608 rays x 512 samples, pose grads ON; "
                    f"pose-frozen variant: {round(frozen_rate, 2)} it/s)"
                ),
                "vs_baseline": round(joint_rate / REALTIME_FLOOR_ITS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
