import os

import numpy as np
import pytest
import yaml

from loner_tpu.config.settings import Settings, generate_options, load_settings


@pytest.fixture
def cfg_tree(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "model.yaml").write_text(
        "render:\n  n_samples: 512\n  chunk: 16384\n"
    )
    (tmp_path / "defaults.yaml").write_text(
        "tracker:\n  icp:\n    threshold: 1.5\n"
        "model: !include sub/model.yaml\n"
        "data:\n  ray_range: [1, 50]\n"
    )
    (tmp_path / "sequence.yaml").write_text(
        "baseline: defaults.yaml\n"
        "changes:\n  data:\n    ray_range: [1, 75]\n"
        "dataset_path: /data/quad\n"
    )
    return tmp_path


class TestSettings:
    def test_attribute_access(self):
        s = Settings({"a": {"b": {"c": 3}}})
        assert s.a.b.c == 3

    def test_include(self, cfg_tree):
        s = load_settings(str(cfg_tree / "defaults.yaml"))
        assert s.model.render.n_samples == 512
        assert s.tracker.icp.threshold == 1.5

    def test_sequence_baseline_and_changes(self, cfg_tree):
        s = load_settings(str(cfg_tree / "sequence.yaml"))
        assert s.data.ray_range == [1, 75]  # overridden
        assert s.model.render.chunk == 16384  # inherited
        assert s.dataset_path == "/data/quad"

    def test_augment_deep_merge(self):
        s = Settings({"a": {"b": 1, "c": 2}, "d": 3})
        out = s.augment({"a": {"b": 10}})
        assert out.a.b == 10 and out.a.c == 2 and out.d == 3
        assert s.a.b == 1  # original untouched

    def test_path_helpers(self):
        s = Settings({"a": {"b": 1}})
        assert s.get_path("a.b") == 1
        assert s.get_path("a.zzz", "dflt") == "dflt"
        s.set_path("x.y.z", 5)
        assert s.x.y.z == 5

    def test_yaml_roundtrip(self, tmp_path):
        s = Settings({"a": {"b": [1, 2]}, "c": "str"})
        p = str(tmp_path / "out.yaml")
        s.dump_yaml(p)
        with open(p) as f:
            back = yaml.safe_load(f)
        assert back == s.to_dict()


class TestGenerateOptions:
    def test_one_at_a_time(self):
        base = Settings({"opt": {"lr": 0.01}, "n": 8})
        opts = generate_options(base, {"opt.lr": [0.01, 0.1], "n": [16]})
        descs = [d for _, d in opts]
        assert descs[0] == "baseline"
        assert "lr=0.1" in descs and "n=16" in descs
        assert len(opts) == 3  # baseline + lr=0.1 + n=16 (0.01 == baseline skipped)

    def test_cartesian(self):
        base = Settings({"a": 1, "b": 2})
        opts = generate_options(base, {"a": [1, 10], "b": [2, 20]}, run_all_combos=True)
        assert len(opts) == 4
        vals = {(s.a, s.b) for s, _ in opts}
        assert vals == {(1, 2), (1, 20), (10, 2), (10, 20)}


class TestSequenceConfigs:
    """The committed per-sequence operating points (reference cfg/ tree:
    fusion_portable/canteen, newer_college/quad, haveri_hpk forest) must
    load through the tier system and build into SlamConfigs."""

    @pytest.mark.parametrize(
        "path,ray_range,extra",
        [
            ("cfg/fusion_portable/canteen.yaml", [1, 50], {}),
            ("cfg/newer_college/quad.yaml", [1, 75], {}),
            (
                "cfg/haveri_hpk/forest.yaml",
                [2.5, 45],
                {"rays_strategy": "MASK", "sky": True},
            ),
        ],
    )
    def test_sequence_files_build(self, path, ray_range, extra):
        from loner_tpu.config.build import build_slam_config

        s = load_settings(path)
        assert list(s.data.ray_range) == ray_range
        assert s["experiment_name"]
        assert "meshing_bounding_box" in s
        cfg = build_slam_config(s, world_scale=20.0)
        assert cfg.mapper.mapper.ray_range == tuple(ray_range)
        if extra.get("rays_strategy"):
            assert cfg.mapper.mapper.rays_strategy == extra["rays_strategy"]
        if extra.get("sky"):
            assert s.system.sky_segmentation is True


class TestAblationStudyFile:
    def test_grouped_ablation_spec(self):
        import yaml

        from loner_tpu.config.settings import generate_options_spec

        base = load_settings("cfg/synthetic_tiny.yaml")
        with open("cfg/ablation_study.yaml") as f:
            spec = yaml.safe_load(f)
        opts = generate_options_spec(base, spec)
        descs = [d for _, d in opts]
        assert descs.count("baseline") == 1
        # cartesian loss group contributes 4 configs, L2_LOS 1, depth-only 1,
        # sky-off 1, gt-poses 1, window selection 2
        assert len(opts) >= 9
        # every option still builds
        from loner_tpu.config.build import build_slam_config

        for s, d in opts[:3]:
            build_slam_config(s, world_scale=20.0)
        # the cartesian group really varied the loss selection
        sels = {
            s.get_path("mapper.optimizer.model_config.loss.loss_selection")
            for s, _ in opts
        }
        assert {"L1_JS", "L1_LOS", "L2_LOS"} <= sels


def test_debug_flags_flow_to_configs():
    """The cfg debug: block's visual-dump flags must reach the runtime
    DebugFlags consumed by the mapper/tracker (reference debug.flags)."""
    from loner_tpu.config.build import build_slam_config
    from loner_tpu.config.settings import load_settings

    s = load_settings(
        "cfg/defaults.yaml",
        overrides={
            "debug": {
                "flags": {"draw_icp_clouds": True, "draw_loss_distribution": True}
            }
        },
    )
    cfg = build_slam_config(s, world_scale=20.0)
    d = cfg.mapper.debug
    assert d.global_enabled
    assert d.draw_icp_clouds and d.draw_loss_distribution
    assert not d.draw_rays and not d.draw_samples
    assert d.dump_dir is None  # LonerSLAM points it at <out_dir>/debug

    # global_enabled=False gates everything regardless of per-flag values
    s2 = load_settings(
        "cfg/defaults.yaml",
        overrides={"debug": {"global_enabled": False, "flags": {"draw_rays": True}}},
    )
    d2 = build_slam_config(s2, world_scale=20.0).mapper.debug
    assert not d2.on("draw_rays")
