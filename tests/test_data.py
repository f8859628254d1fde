"""Data-layer tests on synthetic fixture trees (SURVEY.md §4 plan item c)."""
import numpy as np
import pytest

from soccdpt_tpu.data import synthetic
from soccdpt_tpu.data.anue_labels import (
    LABELS,
    LEVEL4_BASICS_ID,
    level1_to_class,
    level4_basics_to_class,
    seg_ids_to_bool,
)
from soccdpt_tpu.data.bdd import (
    BDDDepthSegmentation,
    BDDOccupancy,
    get_bdd_dataset,
    rgb_seg_to_bool,
)
from soccdpt_tpu.data.idd import get_all_idd_datasets
from soccdpt_tpu.data.loader import collate, iterate_batches, split_train_val
from soccdpt_tpu.data.transforms import (
    compute_resize_shape,
    load_transforms,
)


@pytest.fixture(scope="module")
def bdd_tree(tmp_path_factory):
    base = tmp_path_factory.mktemp("bdd")
    synthetic.make_bdd_fixture(str(base), frames_per_seq=3)
    return str(base)


@pytest.fixture(scope="module")
def idd_tree(tmp_path_factory):
    base = tmp_path_factory.mktemp("idd")
    synthetic.make_idd_fixture(str(base), level_id="level1Ids")
    return str(base)


def test_resize_shape_logic():
    # minimal method rounds to nearest multiple of 32
    assert compute_resize_shape(1920, 1080, 256, 256, False, 32, "minimal") == (256, 256)
    # keep_aspect_ratio lower_bound: output at least as large as target
    w, h = compute_resize_shape(1920, 1080, 384, 384, True, 32, "lower_bound")
    assert w >= 384 and h >= 384
    w, h = compute_resize_shape(1920, 1080, 384, 384, True, 32, "upper_bound")
    assert w <= 384 and h <= 384


def test_load_transforms_swin2_tiny():
    transform, net_w, net_h = load_transforms("dpt_swin2_tiny_256")
    assert (net_w, net_h) == (256, 256)
    img = np.random.default_rng(0).random((96, 128, 3)).astype(np.float32)
    out = transform({"image": img})
    assert out["image"].shape == (3, 256, 256)
    assert out["image"].dtype == np.float32


def test_taxonomy_level4_basics():
    # 3 classes: drivable / vehicle / living (reference anue_labels.py:704-722)
    assert set(level4_basics_to_class.values()) == {0, 1, 2}
    road = next(l for l in LABELS if l.name == "road")
    car = next(l for l in LABELS if l.name == "car")
    person = next(l for l in LABELS if l.name == "person")
    assert level4_basics_to_class[road.level4Id] == 0
    assert level4_basics_to_class[car.level4Id] == 1
    assert level4_basics_to_class[person.level4Id] == 2


def test_seg_ids_to_bool_partition():
    ids = np.array([[0, 1], [6, 255]], np.uint8)
    out = seg_ids_to_bool(ids, level1_to_class)
    assert out.shape == (2, 2, 8)
    assert out.sum() == 4  # each pixel in exactly one class


def test_rgb_seg_roundtrip():
    seg = np.zeros((4, 4, 3), np.uint8)
    seg[0, 0] = (0, 0, 142)
    seg[1, 1] = (220, 20, 60)
    out = rgb_seg_to_bool(seg)
    assert out[0, 0, 1] and out[1, 1, 2]
    assert out[..., 0].sum() == 14


def test_bdd_dataset_sample(bdd_tree):
    transform, _, _ = load_transforms("dpt_swin2_test_64")
    ds = get_bdd_dataset(
        BDDDepthSegmentation,
        transform,
        bdd_tree,
        sequences=("1000000000001", "1000000000002"),
    )
    assert len(ds) == 6
    s = ds[0]
    assert s["image"].shape == (3, 64, 64)
    assert s["disparity"].shape == (1080, 1920)
    assert s["seg"].shape == (3, 1080, 1920)
    assert s["mask_seg"].dtype == bool
    # seg masks partition every pixel across the 3 classes
    assert s["seg"].sum(axis=0).max() <= 1.0


def test_bdd_occupancy_gt(bdd_tree):
    transform, _, _ = load_transforms("dpt_swin2_test_64")
    ds = get_bdd_dataset(
        BDDOccupancy,
        transform,
        bdd_tree,
        sequences=("1000000000001",),
    )
    s = ds[0]
    assert s["occupancy_grid"].shape == (256, 256, 32, 3)
    assert s["occupancy_grid"].dtype == np.float32
    assert set(np.unique(s["occupancy_grid"])) <= {0.0, 1.0}


def test_idd_dataset(idd_tree):
    transform, _, _ = load_transforms("dpt_swin2_test_64")
    train, val = get_all_idd_datasets(
        transform, idd_dataset_path=idd_tree
    )
    assert len(train) == 4 and len(val) == 4
    s = train[0]
    assert s["image"].shape == (3, 64, 64)
    assert s["seg"].shape == (8, 1080, 1920)  # level1 -> 8 classes


def test_split_and_batching(bdd_tree):
    transform, _, _ = load_transforms("dpt_swin2_test_64")
    ds = get_bdd_dataset(
        BDDDepthSegmentation,
        transform,
        bdd_tree,
        sequences=("1000000000001", "1000000000002"),
    )
    train, val = split_train_val(ds, val_percent=0.34, seed=0)
    assert len(train) == 4 and len(val) == 2
    batches = list(iterate_batches(train, batch_size=2, seed=0, epoch=0))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (2, 3, 64, 64)
    # different epoch -> different order (shuffling exists)
    b0 = list(iterate_batches(train, 2, seed=0, epoch=0))[0]["image"]
    b1 = list(iterate_batches(train, 2, seed=0, epoch=1))[0]["image"]
    assert not np.allclose(b0, b1)


def test_multi_host_batch_sharding_disjoint_and_covering():
    """Per-process index shards partition the epoch (data/loader.py)."""
    from soccdpt_tpu.data.loader import iterate_batches

    class Ds:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"idx": np.asarray([i])}

    seen = []
    for proc in range(4):
        for b in iterate_batches(
            Ds(), 2, shuffle=True, seed=0, epoch=0,
            process_index=proc, process_count=4,
        ):
            seen.extend(b["idx"].ravel().tolist())
    assert sorted(seen) == list(range(16))
