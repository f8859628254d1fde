"""End-to-end CLI tests on synthetic fixtures: train a few steps, eval
with visuals, export+reload, dataset analysis."""
import json
import os

import numpy as np
import pytest

from soccdpt_tpu.data import synthetic


@pytest.fixture(scope="module")
def bdd_tree(tmp_path_factory):
    base = tmp_path_factory.mktemp("bdd_cli")
    synthetic.make_bdd_fixture(str(base), frames_per_seq=3)
    return str(base)


def test_train_cli_few_steps(bdd_tree, tmp_path, monkeypatch):
    from soccdpt_tpu.cli.train import main

    monkeypatch.chdir(tmp_path)
    results = main(
        [
            "-v", "3",
            "-dt", "bdd",
            "-t", "dpt_swin2_test_64",
            "-b", bdd_tree,
            "--sweep_json", "/root/repo/config/test_tiny.json",
            "--max_steps", "2",
            "--log_dir", str(tmp_path / "logs"),
        ]
    )
    assert len(results) == 1
    assert "rmse" in results[0] and "iou" in results[0]
    logs = list((tmp_path / "logs").glob("*.jsonl"))
    assert logs, "JSONL metrics written"
    lines = [json.loads(l) for l in logs[0].read_text().splitlines()]
    assert any("loss" in l for l in lines)


def test_eval_cli(bdd_tree, tmp_path, monkeypatch):
    from soccdpt_tpu.cli.eval import main

    monkeypatch.chdir(tmp_path)
    metrics = main(
        [
            "-v", "3",
            "-dt", "bdd",
            "-t", "dpt_swin2_test_64",
            "-b", bdd_tree,
            "--num_samples", "2",
            "--media_dir", str(tmp_path / "media"),
            "--skip_fps",
        ]
    )
    assert "rmse" in metrics and "iou" in metrics
    out_dir = tmp_path / "media" / "dpt_swin2_test_64_bdd_v3"
    assert len(list(out_dir.glob("*.png"))) == 2


def test_export_and_run(tmp_path):
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from soccdpt_tpu.cli.export import export_model

    out = export_model(
        "dpt_swin2_test_64", 3, str(tmp_path / "m.stablehlo"), batch=1
    )
    with open(out, "rb") as fh:
        exported = jax_export.deserialize(fh.read())
    x = jnp.zeros((1, 3, 64, 64), jnp.float32)
    inv_d, seg = exported.call(x)
    assert inv_d.shape == (1, 64, 64)
    assert seg.shape == (1, 3, 64, 64)


def test_datasets_analysis(bdd_tree):
    from soccdpt_tpu.cli.datasets_analysis import analyze
    from soccdpt_tpu.cli.train import build_datasets
    from soccdpt_tpu.core.config import TrainConfig

    tcfg = TrainConfig(dataset="bdd", base_path=bdd_tree)
    dataset, num_classes, _ = build_datasets(tcfg, "dpt_swin2_test_64")
    stats = analyze(dataset, num_classes, max_samples=3)
    assert stats["analyzed"] == 3
    assert len(stats["class_pixel_fraction"]) == 3
    assert "disparity" in stats


def test_eval_patchwise_memory_analysis():
    from soccdpt_tpu.cli.eval_patchwise import measure_step_memory

    mem = measure_step_memory(
        "dpt_swin2_test_64", 3, batch_size=1, patchwise_pct=1.0,
        encoder_pct=1.0, gt_hw=(48, 64),
    )
    assert mem["n_patches"] == 1
    assert any(k.endswith("bytes") for k in mem)


def test_eval_others_builtin_adapter(bdd_tree):
    from soccdpt_tpu.cli.eval_others import builtin_adapter, evaluate_adapter
    from soccdpt_tpu.cli.train import build_datasets
    from soccdpt_tpu.core.config import TrainConfig

    tcfg = TrainConfig(dataset="bdd", base_path=bdd_tree)
    dataset, _, _ = build_datasets(tcfg, "dpt_swin2_test_64")
    adapter = builtin_adapter("dpt_swin2_test_64")
    metrics = evaluate_adapter(adapter, dataset, max_samples=2)
    assert "rmse" in metrics and "a1" in metrics


def test_graph_runs(tmp_path):
    import json as _json

    from soccdpt_tpu.cli.graph_runs import load_runs, plot_metric

    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    with open(log_dir / "metrics_run1.jsonl", "w") as fh:
        for step in range(5):
            fh.write(_json.dumps({"step": step, "loss": 1.0 / (step + 1)}) + "\n")
    runs = load_runs(str(log_dir))
    assert "run1" in runs and len(runs["run1"]) == 5
    out = tmp_path / "loss.png"
    assert plot_metric(runs, "loss", str(out))
    assert out.exists()
    assert not plot_metric(runs, "nonexistent_metric", str(tmp_path / "x.png"))


def test_train_occupancy_cli(bdd_tree, tmp_path, monkeypatch):
    from soccdpt_tpu.cli.train_occupancy import main

    monkeypatch.chdir(tmp_path)
    main(
        [
            "-t", "dpt_swin2_test_64",
            "-b", bdd_tree,
            "--epochs", "1",
            "--max_steps", "1",
            "--val_percent", "0.34",
            # tiny grid: the default 256x256x32 voxelizer+head graph
            # costs ~40 s of CPU compile+execute in this one test
            "--grid", "32", "32", "8",
            "-c", str(tmp_path / "ckpts"),
        ]
    )
    import glob as _glob

    assert _glob.glob(str(tmp_path / "ckpts" / "SOccDPT_Occupancy" / "run" / "*"))


def test_export_with_points(tmp_path):
    """Reference ONNX contract: (disp, seg, points) outputs
    (export_SOccDPT.py:96-141)."""
    import jax.numpy as jnp
    from jax import export as jax_export

    from soccdpt_tpu.cli.export import export_model
    from soccdpt_tpu.core.config import MODEL_TYPES, CameraConfig, ModelConfig

    # small camera via a patched config entry is not available through
    # export_model's signature; use the default-camera path on the tiny
    # model and just verify shapes
    out = export_model(
        "dpt_swin2_test_64", 3, str(tmp_path / "p.stablehlo"),
        batch=1, with_points=True,
    )
    with open(out, "rb") as fh:
        exported = jax_export.deserialize(fh.read())
    inv_d, seg, points = exported.call(jnp.zeros((1, 3, 64, 64), jnp.float32))
    cam = ModelConfig(model_type="dpt_swin2_test_64").camera
    assert inv_d.shape == (1, cam.height, cam.width)
    assert seg.shape[0] == 1 and seg.shape[2:] == (cam.height, cam.width)
    assert points.shape == (1, cam.height, cam.width, 3)


def test_all_sweep_configs_load_and_yield_trials():
    """Every translated reference sweep JSON (reference config/*.json, 24
    files) parses, yields at least one trial, and builds a TrainConfig."""
    import glob

    from soccdpt_tpu.core.config import SweepConfig, train_config_from_params

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "config")
    paths = sorted(glob.glob(os.path.join(cfg_dir, "*.json")))
    assert len(paths) >= 24, paths
    for path in paths:
        sweep = SweepConfig.load(path)
        trial = next(sweep.trials(count=1, seed=0))
        cfg = train_config_from_params(trial)
        assert cfg.batch_size >= 1, path
        assert 0 < cfg.learning_rate < 1, path
        assert cfg.epochs >= 1, path
        if "loss_weights" in trial:
            assert len(cfg.loss_weights) == 2, path


def test_eval_others_stablehlo_file_adapter(bdd_tree, tmp_path):
    """A foreign *artifact file* can be scored with the shared metrics
    (reference eval_others.py:42-51): export StableHLO, evaluate via
    the stablehlo:<path> adapter spec."""
    from soccdpt_tpu.cli.eval_others import evaluate_adapter, load_adapter
    from soccdpt_tpu.cli.export import export_model
    from soccdpt_tpu.cli.train import build_datasets
    from soccdpt_tpu.core.config import TrainConfig

    out = export_model(
        "dpt_swin2_test_64", 3, str(tmp_path / "m.stablehlo"), batch=1
    )
    tcfg = TrainConfig(dataset="bdd", base_path=bdd_tree)
    dataset, _, _ = build_datasets(tcfg, "dpt_swin2_test_64")
    adapter = load_adapter(f"stablehlo:{out}")
    metrics = evaluate_adapter(adapter, dataset, max_samples=2)
    assert "rmse" in metrics and "a1" in metrics
    assert np.isfinite(metrics["rmse"])


def test_eval_others_onnx_adapter_clear_error(tmp_path):
    """Without onnxruntime installed, the onnx:<path> adapter fails with
    an actionable message (and unknown schemes are rejected)."""
    from soccdpt_tpu.cli.eval_others import file_adapter

    p = tmp_path / "m.onnx"
    p.write_bytes(b"\x00")
    try:
        import onnxruntime  # noqa: F401
    except ImportError:
        with pytest.raises(RuntimeError, match="onnxruntime"):
            file_adapter("onnx", str(p))
    with pytest.raises(ValueError, match="unknown file adapter"):
        file_adapter("bogus", str(p))
    with pytest.raises(FileNotFoundError):
        file_adapter("stablehlo", str(tmp_path / "missing"))


def test_eval_timing_cli_params_as_argument():
    """eval_timing runs on the tiny model; weights travel as a jit
    argument (closing over host arrays bakes them into the module as
    constants — overflows the remote-compile transport at 200M params)."""
    from soccdpt_tpu.cli.eval_timing import main

    rows = main(["-t", "dpt_swin2_test_64", "--json"])
    assert len(rows) == 1
    assert rows[0]["model_type"] == "dpt_swin2_test_64"
    assert rows[0]["hz"] > 0


def test_eval_others_external_registry_lists_reference_baselines():
    """The registry must cover all seven reference wrappers
    (reference eval_others.py:42-51)."""
    from soccdpt_tpu.cli.eval_others import EXTERNAL_BASELINES

    assert set(EXTERNAL_BASELINES) == {
        "DPT_SwinV2_T_256", "DPT_Hybrid", "DPT_Large",
        "monodepth2", "manydepth", "zerodepth", "packnet",
    }


def test_eval_others_midas_adapter_mocked_hub(monkeypatch, bdd_tree):
    """Exercise the MiDaS wrapper code path end-to-end (hub mocked:
    no network in this environment): raw frame -> hub transform ->
    model -> (1, H', W') disparity -> shared SSI metrics."""
    import torch

    from soccdpt_tpu.cli.eval_others import evaluate_adapter, external_adapter
    from soccdpt_tpu.cli.train import build_datasets
    from soccdpt_tpu.core.config import TrainConfig

    class FakeMidas(torch.nn.Module):
        def forward(self, x):  # (B, 3, H, W) -> (B, H, W) inverse depth
            return x.abs().mean(dim=1) + 0.1

    class FakeTransforms:
        @staticmethod
        def swin256_transform(img):
            t = torch.tensor(
                np.asarray(img, np.float32).transpose(2, 0, 1)[None] / 255.0
            )
            return torch.nn.functional.interpolate(
                t, size=(256, 256), mode="bilinear", align_corners=False
            )

        dpt_transform = swin256_transform

    calls = []

    def fake_hub_load(repo, name, *a, **k):
        calls.append((repo, name))
        assert repo == "intel-isl/MiDaS"
        return FakeTransforms() if name == "transforms" else FakeMidas()

    monkeypatch.setattr(torch.hub, "load", fake_hub_load)

    tcfg = TrainConfig(dataset="bdd", base_path=bdd_tree)
    dataset, _, _ = build_datasets(tcfg, "dpt_swin2_test_64")
    adapter = external_adapter("DPT_SwinV2_T_256")
    assert adapter.wants_raw
    metrics = evaluate_adapter(adapter, dataset, max_samples=2)
    assert "rmse" in metrics and np.isfinite(metrics["rmse"])
    assert ("intel-isl/MiDaS", "DPT_SwinV2_T_256") in calls


def test_eval_others_vidar_adapters_mocked_hub(monkeypatch, bdd_tree):
    """zerodepth/packnet wrappers: vidar models emit DEPTH; the adapter
    must resize+normalize per the reference's transforms, thread camera
    intrinsics (zerodepth), and invert to disparity
    (reference eval_others.py:157-199, 228-241)."""
    import torch

    from soccdpt_tpu.cli.eval_others import evaluate_adapter, external_adapter
    from soccdpt_tpu.cli.train import build_datasets, dataset_camera
    from soccdpt_tpu.core.config import TrainConfig

    seen = {}

    class FakeZeroDepth(torch.nn.Module):
        def forward(self, x, intrinsics):
            seen["intrinsics"] = np.asarray(intrinsics)
            seen["zx"] = np.asarray(x)
            return torch.full((1, 1, x.shape[2], x.shape[3]), 2.0)

    class FakePackNet(torch.nn.Module):
        def forward(self, x):
            seen["px"] = np.asarray(x)
            return [torch.full((1, 1, x.shape[2], x.shape[3]), 4.0)]

    def fake_hub_load(repo, name, *a, **k):
        assert repo == "TRI-ML/vidar"
        return FakeZeroDepth() if name == "ZeroDepth" else FakePackNet()

    monkeypatch.setattr(torch.hub, "load", fake_hub_load)

    tcfg = TrainConfig(dataset="bdd", base_path=bdd_tree)
    dataset, _, _ = build_datasets(tcfg, "dpt_swin2_test_64")
    cam = dataset_camera(dataset)

    z = external_adapter("zerodepth", camera=cam)
    disp = z(np.asarray(dataset[0]["image_raw"]))
    np.testing.assert_allclose(disp, 0.5)  # depth 2.0 -> disparity 0.5
    # intrinsics scaled by the reference's 0.5 image scale, K[2,2] kept 1
    K = seen["intrinsics"][0]
    assert K[0, 0] == pytest.approx(cam.fx * 0.5)
    assert K[2, 2] == pytest.approx(1.0)
    assert seen["zx"].max() <= 1.0  # /255 normalization applied

    p = external_adapter("packnet")
    disp = p(np.asarray(dataset[0]["image_raw"]))
    np.testing.assert_allclose(disp, 0.25)  # depth 4.0 -> disparity 0.25
    assert seen["px"].shape[-2:] == (384, 640)  # reference resize (640, 384)

    metrics = evaluate_adapter(z, dataset, max_samples=1)
    assert np.isfinite(metrics["rmse"])


def test_eval_others_pkg_gated_adapters_clear_error(monkeypatch):
    """monodepth2/manydepth need packages absent here: the adapter must
    raise a clear RuntimeError naming the requirement on first use, not
    an ImportError at registry time."""
    from soccdpt_tpu.cli.eval_others import external_adapter

    for name in ("monodepth2", "manydepth"):
        adapter = external_adapter(name)  # construction must not raise
        with pytest.raises(RuntimeError, match=name):
            adapter(np.zeros((32, 48, 3), np.uint8))


def test_eval_others_list_registry(capsys):
    from soccdpt_tpu.cli.eval_others import main

    main(["--list"])
    out = capsys.readouterr().out
    assert "zerodepth" in out and "stablehlo" in out
