"""Real on-disk dataset layouts over mock directory trees: CUB-200-2011 split
files, Stanford-Cars devkit .mat annotations, imagenet_a/r wnid remap,
Caltech-101 manual split file, and the single-scan imagenet=N subsets
(reference registry: schema_inference/data/aug.py:26-59)."""

import os

import numpy as np
import pytest

from schemanet_tpu.data.datasets import DATASET_REGISTRY

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _write_img(path, value=128):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.full((8, 8, 3), value, np.uint8)).save(path)


# ---------------------------------------------------------------------------
# CUB-200-2011
# ---------------------------------------------------------------------------


def test_cub200_split_files(tmp_path):
    base = tmp_path / "CUB_200_2011"
    rows = [
        ("1", "001.Black_footed_Albatross/a1.jpg", "1", "1"),
        ("2", "001.Black_footed_Albatross/a2.jpg", "1", "0"),
        ("3", "002.Laysan_Albatross/b1.jpg", "2", "1"),
        ("4", "002.Laysan_Albatross/b2.jpg", "2", "0"),
        ("5", "002.Laysan_Albatross/b3.jpg", "2", "1"),
    ]
    (base).mkdir(parents=True)
    with open(base / "images.txt", "w") as f:
        f.writelines(f"{i} {p}\n" for i, p, _, _ in rows)
    with open(base / "image_class_labels.txt", "w") as f:
        f.writelines(f"{i} {c}\n" for i, _, c, _ in rows)
    with open(base / "train_test_split.txt", "w") as f:
        f.writelines(f"{i} {t}\n" for i, _, _, t in rows)
    with open(base / "classes.txt", "w") as f:
        f.write("1 001.Black_footed_Albatross\n2 002.Laysan_Albatross\n")
    for _, p, _, _ in rows:
        _write_img(str(base / "images" / p))

    build = DATASET_REGISTRY.get("cub_200")
    train = build(str(tmp_path), split="train")
    val = build(str(tmp_path), split="val")
    assert len(train) == 3 and len(val) == 2
    assert train.num_classes == 2
    assert [lbl for _, lbl in train.samples] == [0, 1, 1]
    assert [lbl for _, lbl in val.samples] == [0, 1]
    assert train.samples[0][0].endswith("images/001.Black_footed_Albatross/a1.jpg")
    img, lbl = train[0]
    assert img.shape == (8, 8, 3) and lbl == 0


def test_cub200_imagefolder_fallback(tmp_path):
    _write_img(str(tmp_path / "train" / "c0" / "x.jpg"))
    _write_img(str(tmp_path / "val" / "c0" / "y.jpg"))
    build = DATASET_REGISTRY.get("cub_200")
    assert len(build(str(tmp_path), split="train")) == 1
    assert len(build(str(tmp_path), split="val")) == 1


# ---------------------------------------------------------------------------
# Stanford Cars
# ---------------------------------------------------------------------------


def test_stanford_cars_devkit(tmp_path):
    from scipy.io import savemat

    devkit = tmp_path / "devkit"
    devkit.mkdir()
    savemat(str(devkit / "cars_meta.mat"),
            {"class_names": np.array(["AM General Hummer", "Acura RL"], object)})
    train_annos = np.array(
        [(np.int32(1), "t1.jpg"), (np.int32(2), "t2.jpg"), (np.int32(1), "t3.jpg")],
        dtype=[("class", "i4"), ("fname", "O")],
    )
    test_annos = np.array(
        [(np.int32(2), "v1.jpg")], dtype=[("class", "i4"), ("fname", "O")]
    )
    savemat(str(devkit / "cars_train_annos.mat"), {"annotations": train_annos})
    savemat(str(devkit / "cars_test_annos_withlabels.mat"), {"annotations": test_annos})
    for fn in ("t1.jpg", "t2.jpg", "t3.jpg"):
        _write_img(str(tmp_path / "cars_train" / fn))
    _write_img(str(tmp_path / "cars_test" / "v1.jpg"))

    build = DATASET_REGISTRY.get("stanford_cars")
    train = build(str(tmp_path), split="train")
    val = build(str(tmp_path), split="val")
    assert train.num_classes == 2 and train.classes[1] == "Acura RL"
    assert [lbl for _, lbl in train.samples] == [0, 1, 0]
    assert len(val) == 1 and val.samples[0][1] == 1
    img, lbl = val[0]
    assert img.shape == (8, 8, 3) and lbl == 1


# ---------------------------------------------------------------------------
# imagenet_a / imagenet_r
# ---------------------------------------------------------------------------


def test_imagenet_a_label_remap(tmp_path):
    for wnid in ("n01440764", "n09999999"):
        _write_img(str(tmp_path / "ina" / wnid / "img.jpg"))
    full = ["n00000001", "n01440764", "n05555555", "n09999999"]
    classes_fp = tmp_path / "wnids.txt"
    classes_fp.write_text("".join(w + "\n" for w in full))

    build = DATASET_REGISTRY.get("imagenet_a")
    # local label space without the mapping file
    local = build(str(tmp_path / "ina"))
    assert local.num_classes == 2
    assert sorted(lbl for _, lbl in local.samples) == [0, 1]
    # full 1000-style label space with it
    mapped = build(str(tmp_path / "ina"), imagenet_classes_file=str(classes_fp))
    assert mapped.num_classes == 4
    assert sorted(lbl for _, lbl in mapped.samples) == [1, 3]


def test_imagenet_r_missing_wnid_raises(tmp_path):
    _write_img(str(tmp_path / "inr" / "nXXXXXXX" / "img.jpg"))
    classes_fp = tmp_path / "wnids.txt"
    classes_fp.write_text("n01440764\n")
    with pytest.raises(ValueError, match="absent"):
        DATASET_REGISTRY.get("imagenet_r")(
            str(tmp_path / "inr"), imagenet_classes_file=str(classes_fp)
        )


# ---------------------------------------------------------------------------
# Caltech-101 manual split
# ---------------------------------------------------------------------------


def test_caltech101_split_file(tmp_path):
    root = tmp_path / "caltech"
    for cls, names in (("accordion", ["i1.jpg", "i2.jpg"]), ("anchor", ["j1.jpg"])):
        for n in names:
            _write_img(str(root / cls / n))
    split_fp = tmp_path / "train_split.txt"
    split_fp.write_text("accordion/i1.jpg\nanchor/j1.jpg\n")

    build = DATASET_REGISTRY.get("caltech_101")
    train = build(str(root), split="train", split_file=str(split_fp))
    val = build(str(root), split="val", split_file=str(split_fp))
    train_paths = {os.path.basename(train.base.samples[i][0]) for i in train.indices}
    val_paths = {os.path.basename(val.base.samples[i][0]) for i in val.indices}
    assert train_paths == {"i1.jpg", "j1.jpg"}
    assert val_paths == {"i2.jpg"}


# ---------------------------------------------------------------------------
# imagenet=N single-scan subsets
# ---------------------------------------------------------------------------


def test_imagenet_subset_single_scan(tmp_path, monkeypatch):
    for wnid in ("n01", "n02", "n03"):
        _write_img(str(tmp_path / "train" / wnid / "a.jpg"))
        _write_img(str(tmp_path / "val" / wnid / "b.jpg"))

    import schemanet_tpu.data.datasets as ds_mod

    listdir_calls = []
    real_listdir = os.listdir

    def counting_listdir(path):
        listdir_calls.append(path)
        return real_listdir(path)

    monkeypatch.setattr(ds_mod.os, "listdir", counting_listdir)
    sub = DATASET_REGISTRY.get("imagenet=10")(str(tmp_path), split="train")
    # 1 root listing + one per *kept* class dir; crucially NOT two full walks
    assert len(listdir_calls) == 1 + 3
    assert sub.num_classes == 3 and len(sub) == 3

    listdir_calls.clear()
    two = DATASET_REGISTRY.get("imagenet=20")(
        str(tmp_path), split="val", classes=["n01", "n02"]
    )
    assert len(listdir_calls) == 2  # explicit classes -> no root listing
    assert two.num_classes == 2 and len(two) == 2


# ---------------------------------------------------------------------------
# Class-list file formats (configs/datasets/README.md + examples/)
# ---------------------------------------------------------------------------


def test_load_class_list_plain_txt(tmp_path):
    from schemanet_tpu.data.datasets import load_class_list

    fp = tmp_path / "classes.txt"
    fp.write_text("n01440764\nn01773157\n\nn02051845\n")
    assert load_class_list(str(fp)) == ["n01440764", "n01773157", "n02051845"]


def test_load_class_list_reference_pandas_csv():
    # the shipped example files use the reference's pandas-style csv shape
    # (header ",classes", rows "<index>,<name>") — names come from the LAST
    # column, header skipped
    from schemanet_tpu.data.datasets import load_class_list

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ex = os.path.join(here, "configs", "datasets", "examples")
    caltech = load_class_list(os.path.join(ex, "caltech_101_classes.example.csv"))
    assert caltech == ["accordion", "airplanes", "anchor", "ant", "barrel"]
    mini = load_class_list(os.path.join(ex, "mini_imagenet_classes.example.csv"))
    assert mini[0] == "n01532829" and len(mini) == 5


def test_mini_imagenet_classes_file(tmp_path):
    # classes_file restricts AND orders the class set (row order = label id)
    for cls in ("n01532829", "n01558993", "n09999999"):
        _write_img(str(tmp_path / "train" / cls / "x.jpg"))
    fp = tmp_path / "classes.csv"
    fp.write_text(",classes\n0,n01558993\n1,n01532829\n")
    build = DATASET_REGISTRY.get("mini_imagenet")
    ds = build(str(tmp_path), split="train", classes_file=str(fp))
    assert ds.classes == ["n01558993", "n01532829"]
    assert ds.num_classes == 2
