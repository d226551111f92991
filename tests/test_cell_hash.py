"""CellHash encoding: correctness, gradients, and convergence parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loner_tpu.ops.cell_hash import (
    CellHashConfig,
    cell_hash_encode_t,
    init_cell_table,
    _trilinear_w,
)


@pytest.fixture(scope="module")
def setup():
    cfg = CellHashConfig(n_levels=4, log2_cells=10)
    key = jax.random.PRNGKey(0)
    table = init_cell_table(key, cfg) * 1e4
    pts_t = jax.random.uniform(jax.random.PRNGKey(1), (3, 257))
    return cfg, table, pts_t


class TestCellHashForward:
    def test_shape_and_finite(self, setup):
        cfg, table, pts_t = setup
        out = cell_hash_encode_t(table, pts_t, cfg)
        assert out.shape == (cfg.n_levels * 2, 257)
        assert np.isfinite(np.asarray(out)).all()

    def test_interpolation_weights_at_vertex(self, setup):
        cfg, table, pts_t = setup
        # at a cell's min corner (frac = 0), output = corner-0 features
        # frac zero => p*s + 0.5 integer: p = (k - 0.5)/s with s = base-1
        s = float(cfg.level_scales()[0])
        p = jnp.asarray([[1.5 / s], [1.5 / s], [1.5 / s]])
        out = np.asarray(cell_hash_encode_t(table, p, cfg))
        # compare against manual lookup for level 0
        from loner_tpu.ops.cell_hash import _cell_and_frac, _cell_ids

        cells, frac = _cell_and_frac(p, s, int(cfg.level_resolutions()[0]))
        np.testing.assert_allclose(np.asarray(frac), 0.0, atol=1e-5)
        idx = int(_cell_ids(cells, int(cfg.level_resolutions()[0]), bool(cfg.level_is_dense()[0]), cfg.table_size)[0])
        expect = np.asarray(table[0, idx, 0:2])  # corner 0's two features
        np.testing.assert_allclose(out[0:2, 0], expect, atol=2e-2, rtol=2e-2)

    def test_continuity_within_cell(self, setup):
        cfg, table, pts_t = setup
        p = jnp.asarray([[0.4031], [0.5017], [0.6013]])
        d = 1e-6
        a = cell_hash_encode_t(table, p, cfg)
        b = cell_hash_encode_t(table, p + d, cfg)
        assert float(jnp.max(jnp.abs(a - b))) < 1e-2

    def test_jit(self, setup):
        cfg, table, pts_t = setup
        out = jax.jit(lambda t, p: cell_hash_encode_t(t, p, cfg))(table, pts_t)
        assert np.isfinite(np.asarray(out)).all()


class TestCellHashBackward:
    def test_table_grad_finite_and_local(self, setup):
        cfg, table, pts_t = setup
        g = jax.grad(lambda t: jnp.sum(cell_hash_encode_t(t, pts_t, cfg) ** 2))(table)
        assert g.shape == table.shape
        ga = np.asarray(g)
        assert np.isfinite(ga).all() and np.abs(ga).sum() > 0

    def test_table_grad_matches_numerical(self, setup):
        cfg, table, pts_t = setup
        p1 = pts_t[:, :17]

        def loss(t):
            return jnp.sum(jnp.sin(cell_hash_encode_t(t, p1, cfg)))

        g = np.asarray(jax.grad(loss)(table))
        # numerical check on a few touched entries
        touched = np.argwhere(np.abs(g) > 1e-4)[:5]
        eps = 1e-2
        for lv, ti, fi in touched:
            tp = table.at[lv, ti, fi].add(eps)
            tm = table.at[lv, ti, fi].add(-eps)
            num = (float(loss(tp)) - float(loss(tm))) / (2 * eps)
            assert abs(num - g[lv, ti, fi]) < 0.15 * max(abs(num), 1.0), (num, g[lv, ti, fi])

    def test_point_grad_matches_numerical(self, setup):
        cfg, table, pts_t = setup
        p1 = pts_t[:, :9]

        def loss(p):
            return jnp.sum(jnp.sin(cell_hash_encode_t(table, p, cfg)))

        g = np.asarray(jax.grad(loss)(p1))
        eps = 1e-4
        for a in range(3):
            pp = p1.at[a, 3].add(eps)
            pm = p1.at[a, 3].add(-eps)
            num = (float(loss(pp)) - float(loss(pm))) / (2 * eps)
            # bf16 features + finite differencing: loose tolerance
            assert abs(num - g[a, 3]) < 0.25 * max(abs(num), 2.0), (a, num, g[a, 3])

    def test_stochastic_scatter_unbiased(self, setup):
        cfg, table, pts_t = setup

        def loss(t, key):
            return jnp.sum(cell_hash_encode_t(t, pts_t, cfg, key) ** 2)

        g_exact = np.asarray(jax.grad(lambda t: loss(t, None))(table))
        acc = np.zeros_like(g_exact)
        k = 64
        gf = jax.jit(jax.grad(loss))
        for i in range(k):
            acc += np.asarray(gf(table, jax.random.PRNGKey(i)))
        mean = acc / k
        denom = np.abs(g_exact).max() + 1e-9
        mask = np.abs(g_exact) > denom * 0.05
        rel = np.abs(mean[mask] - g_exact[mask]) / denom
        assert np.median(rel) < 0.15, float(np.median(rel))


class TestConvergenceParity:
    def test_trains_on_synthetic_scene(self):
        """The field must converge with CellHash like with the vertex hash
        (reuses the train-step convergence harness at reduced budget)."""
        import sys

        sys.path.insert(0, "tests")
        from test_train_step import eval_l1_depth, tiny_mapper_config
        from loner_tpu.data import synthetic
        from loner_tpu.data.scan import make_lidar_scan, sky_scan
        from loner_tpu.geometry import se3
        from loner_tpu.geometry.world_cube import compute_world_cube
        from loner_tpu.mapping.keyframe import KeyFrame, stack_window
        from loner_tpu.mapping.optimizer import (
            TrainStepFlags,
            init_mapper_state,
            make_train_step,
        )

        scene = synthetic.Scene.default()
        poses, ts = synthetic.circular_trajectory(n_poses=4, radius=6.0, z=1.5)
        cube = compute_world_cube(poses, ray_range=(1.0, 40.0), rebase_to_first_pose=False)
        cfg = tiny_mapper_config(float(cube.scale_factor))
        cfg = cfg._replace(nerf=cfg.nerf._replace(encoding_impl="cell"))

        kfs = []
        for i, (T, t0) in enumerate(zip(poses, ts)):
            dirs, dists, stamps, hit = synthetic.simulate_scan(
                scene, T, t0, n_channels=16, n_azimuth=256, max_range=40.0
            )
            scan = make_lidar_scan(dirs[hit], dists[hit], stamps[hit], pad_to=4096)
            sky = sky_scan(dirs[~hit][:512], 41.0, t0, pad_to=512)
            kfs.append(KeyFrame(scan=scan, timestamp=t0, pose_index=i, tracked_pose=T, gt_pose=T, sky=sky))
        window = stack_window(kfs, n_sky_pad=512)
        pose6 = jax.jit(se3.matrix_to_pose)(jnp.asarray(np.stack(poses), jnp.float32))
        state = init_mapper_state(jax.random.PRNGKey(0), cfg)
        state = state._replace(poses=state.poses.at[:4].set(pose6))
        step = make_train_step(cfg, cube)
        flags = TrainStepFlags(jnp.asarray(False), jnp.asarray(True), jnp.asarray(True), jnp.asarray(False))
        pm = jnp.zeros((cfg.max_keyframes,))
        key = jax.random.PRNGKey(42)
        l1_before = eval_l1_depth(cfg, cube, state, scene, poses[0])
        for i in range(300):
            key, sub = jax.random.split(key)
            occ = jnp.asarray((i % 10) == 9)
            state, aux = step(state, window, sub, flags._replace(do_occ_update=occ), pm, jnp.asarray(i))
        assert int(state.skipped_steps) == 0
        l1_after = eval_l1_depth(cfg, cube, state, scene, poses[0])
        assert l1_after < l1_before * 0.5
        assert l1_after < 3.5, f"CellHash L1 {l1_after:.2f} m"


class TestLevelSampledBackward:
    def test_level1_table_grad_unbiased(self):
        """Averaged over jitter, the level1 d_table matches the exact one."""
        cfg_exact = CellHashConfig(n_levels=4, log2_cells=10, base_resolution=4)
        cfg_l1 = cfg_exact._replace(bwd="level1")
        key = jax.random.PRNGKey(0)
        table = init_cell_table(key, cfg_exact)

        def g_of(cfg, pts):
            return jax.grad(lambda t: jnp.sum(cell_hash_encode_t(t, pts, cfg) * w_out))(table)

        k1, k2 = jax.random.split(key)
        w_out = jax.random.normal(k1, (cfg_exact.output_dim, 1))
        base = jax.random.uniform(k2, (3, 512), minval=0.05, maxval=0.95)

        acc_exact = np.zeros(table.shape, np.float64)
        acc_l1 = np.zeros(table.shape, np.float64)
        trials = 64
        for i in range(trials):
            jitter = jax.random.uniform(jax.random.PRNGKey(100 + i), base.shape) * 1e-3
            pts = base + jitter
            acc_exact += np.asarray(g_of(cfg_exact, pts), np.float64)
            acc_l1 += np.asarray(g_of(cfg_l1, pts), np.float64)
        acc_exact /= trials
        acc_l1 /= trials
        denom = np.abs(acc_exact).mean()
        assert np.abs(acc_l1 - acc_exact).mean() / denom < 0.35

    def test_level1_point_grad_identical(self):
        """d_pts is exact in both modes."""
        cfg_exact = CellHashConfig(n_levels=4, log2_cells=10, base_resolution=4)
        cfg_l1 = cfg_exact._replace(bwd="level1")
        key = jax.random.PRNGKey(1)
        table = init_cell_table(key, cfg_exact)
        pts = jax.random.uniform(jax.random.PRNGKey(2), (3, 64), minval=0.1, maxval=0.9)

        def gp(cfg):
            return jax.grad(lambda p: jnp.sum(jnp.sin(cell_hash_encode_t(table, p, cfg))))(pts)

        np.testing.assert_allclose(np.asarray(gp(cfg_l1)), np.asarray(gp(cfg_exact)), rtol=1e-6)
