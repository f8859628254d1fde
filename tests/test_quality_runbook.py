"""CI dry run of the quality-parity runbook (QUALITY_PARITY.md).

The day real BDD data + a reference ``.pth`` exist, the documented
command closes the reference's 41.71 IoU / 12.4075 RMSE table
(/root/reference/README.md:7). This test executes that exact command
end-to-end on synthetic fixtures: fabricate a reference-layout torch
checkpoint (inverse importer), ``torch.save`` it, and run the eval CLI
with ``-l fixture.pth`` — proving the .pth -> torch_import -> eval
pipeline works before the real artifacts arrive.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from soccdpt_tpu.core.config import ModelConfig
from soccdpt_tpu.data import synthetic
from soccdpt_tpu.models.soccdpt import build_model

from test_torch_import import _to_torch_sd


@pytest.fixture(scope="module")
def bdd_tree(tmp_path_factory):
    base = tmp_path_factory.mktemp("bdd")
    synthetic.make_bdd_fixture(str(base), frames_per_seq=3)
    return str(base)


def test_quality_runbook_dry_run(bdd_tree, tmp_path, monkeypatch):
    from soccdpt_tpu.cli.eval import main

    # Fabricate a reference-layout V3 checkpoint for the tiny model.
    cfg = ModelConfig(model_type="dpt_swin2_test_64", version=3, features=64)
    model = build_model(cfg)
    x = jnp.zeros((1, 3, 64, 64))
    variables = model.init(jax.random.PRNGKey(7), x, return_raw=True)
    sd = _to_torch_sd(
        jax.device_get(variables["params"]),
        jax.device_get(variables["batch_stats"]),
    )
    pth = tmp_path / "reference_checkpoint.pth"
    # The reference saves raw ``model.state_dict()`` tensors
    # (train_SOccDPT.py checkpointing); mirror that exactly.
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, pth)

    monkeypatch.chdir(tmp_path)
    metrics = main(
        [
            "-v", "3",
            "-dt", "bdd",
            "-t", "dpt_swin2_test_64",
            "-b", bdd_tree,
            "-l", str(pth),
            "--num_samples", "2",
            "--media_dir", str(tmp_path / "media"),
            "--skip_fps",
        ]
    )
    assert "rmse" in metrics and "iou" in metrics
    for k, v in metrics.items():
        assert math.isfinite(v), (k, v)

    # The .pth weights must actually land: rerunning without -l uses a
    # different (random) init, so depth output must differ.
    metrics_rand = main(
        [
            "-v", "3",
            "-dt", "bdd",
            "-t", "dpt_swin2_test_64",
            "-b", bdd_tree,
            "--num_samples", "2",
            "--media_dir", str(tmp_path / "media2"),
            "--skip_fps",
        ]
    )
    assert metrics != metrics_rand, "loading the .pth had no effect"
