"""dataset_tool source/transform parity tests (reference dataset_tool.py).

Round-trips per input source: image folder, image zip, CIFAR-10 tarball,
MNIST idx archive (both synthesized in the reference's exact layouts),
plus the transform modes including the non-square center-crop-wide
letterbox and the uniform-attribute / power-of-two validation.
"""

import gzip
import io
import json
import os
import pickle
import tarfile
import zipfile

import numpy as np
import pytest
from PIL import Image

from tgi.apps.dataset_tool import convert


def _write_images(d, n=3, size=32, nested=False):
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    names = []
    for i in range(n):
        sub = os.path.join(d, f"{i:02d}") if nested else d
        os.makedirs(sub, exist_ok=True)
        name = os.path.join(sub, f"im{i}.png")
        Image.fromarray(rng.randint(0, 255, (size, size, 3),
                                    dtype=np.uint8)).save(name)
        names.append(os.path.relpath(name, d).replace("\\", "/"))
    return names


def test_folder_to_zip_with_labels(tmp_path):
    src = str(tmp_path / "src")
    names = _write_images(src, n=3, nested=True)
    with open(os.path.join(src, "dataset.json"), "w") as f:
        json.dump({"labels": [[n, [float(i), 0.0, 1.0]]
                              for i, n in enumerate(names)]}, f)
    dest = str(tmp_path / "out.zip")
    assert convert(src, dest) == 3
    with zipfile.ZipFile(dest) as z:
        assert "00000/img00000000.png" in z.namelist()
        meta = json.loads(z.read("dataset.json"))
    assert meta["labels"] == [[f"00000/img0000000{i}.png",
                               [float(i), 0.0, 1.0]] for i in range(3)]
    # The training Dataset can consume the archive.
    from tgi.train.dataset import ImageFolderDataset
    ds = ImageFolderDataset(dest)
    assert len(ds) == 3 and ds.label_dim == 3


def test_zip_to_folder_roundtrip(tmp_path):
    src_dir = str(tmp_path / "src")
    _write_images(src_dir, n=2)
    z1 = str(tmp_path / "a.zip")
    convert(src_dir, z1)
    out_dir = str(tmp_path / "unpacked")
    assert convert(z1, out_dir) == 2
    assert os.path.exists(os.path.join(out_dir, "00000/img00000000.png"))
    a = np.array(Image.open(os.path.join(out_dir, "00000/img00000000.png")))
    with zipfile.ZipFile(z1) as z:
        b = np.array(Image.open(io.BytesIO(z.read("00000/img00000000.png"))))
    np.testing.assert_array_equal(a, b)


def test_cifar10_source(tmp_path):
    # Synthesize the exact cifar-10-python.tar.gz layout
    # (dataset_tool.py:156-177).
    rng = np.random.RandomState(1)
    tar_path = str(tmp_path / "cifar-10-python.tar.gz")
    with tarfile.open(tar_path, "w:gz") as tar:
        for b in range(1, 6):
            data = {"data": rng.randint(0, 256, (10000, 3072),
                                        dtype=np.int64).astype(np.uint8),
                    "labels": list(rng.randint(0, 10, 10000))}
            blob = pickle.dumps(data)
            info = tarfile.TarInfo(f"cifar-10-batches-py/data_batch_{b}")
            info.size = len(blob)
            tar.addfile(info, io.BytesIO(blob))
    dest = str(tmp_path / "cifar.zip")
    assert convert(tar_path, dest, max_images=20) == 20
    with zipfile.ZipFile(dest) as z:
        meta = json.loads(z.read("dataset.json"))
        img = np.array(Image.open(io.BytesIO(
            z.read("00000/img00000000.png"))))
    assert img.shape == (32, 32, 3)
    assert len(meta["labels"]) == 20
    assert all(0 <= lbl <= 9 for _, lbl in meta["labels"])


def test_mnist_source(tmp_path):
    # Synthesize the idx-ubyte pair (dataset_tool.py:184-206).
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, (60000, 28, 28), dtype=np.int64
                       ).astype(np.uint8)
    lbls = rng.randint(0, 10, 60000).astype(np.uint8)
    img_gz = str(tmp_path / "train-images-idx3-ubyte.gz")
    lbl_gz = str(tmp_path / "train-labels-idx1-ubyte.gz")
    with gzip.open(img_gz, "wb") as f:
        f.write(b"\x00" * 16 + imgs.tobytes())
    with gzip.open(lbl_gz, "wb") as f:
        f.write(b"\x00" * 8 + lbls.tobytes())
    dest = str(tmp_path / "mnist.zip")
    assert convert(img_gz, dest, max_images=15) == 15
    with zipfile.ZipFile(dest) as z:
        img = np.array(Image.open(io.BytesIO(
            z.read("00000/img00000003.png"))))
        meta = json.loads(z.read("dataset.json"))
    assert img.shape == (32, 32)                 # 28 -> 32 zero-pad
    np.testing.assert_array_equal(img[2:-2, 2:-2], imgs[3])
    assert img[0].max() == 0
    assert meta["labels"][3][1] == int(lbls[3])


def test_center_crop_and_resolution(tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    rng = np.random.RandomState(3)
    Image.fromarray(rng.randint(0, 255, (48, 96, 3), dtype=np.uint8)
                    ).save(os.path.join(src, "wide.png"))
    dest = str(tmp_path / "c.zip")
    convert(src, dest, transform="center-crop", resolution="32x32")
    with zipfile.ZipFile(dest) as z:
        img = np.array(Image.open(io.BytesIO(
            z.read("00000/img00000000.png"))))
    assert img.shape == (32, 32, 3)


def test_center_crop_wide_letterbox(tmp_path):
    """Non-square WxH: the output is a width x width canvas with the
    height-centered image strip (dataset_tool.py:243-255)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    Image.fromarray(np.full((300, 400, 3), 200, np.uint8)
                    ).save(os.path.join(src, "a.png"))
    # A too-small image must be DROPPED, not up-scaled.
    Image.fromarray(np.full((20, 30, 3), 100, np.uint8)
                    ).save(os.path.join(src, "b.png"))
    dest = str(tmp_path / "w.zip")
    assert convert(src, dest, transform="center-crop-wide",
                   resolution="64x48") == 1
    with zipfile.ZipFile(dest) as z:
        img = np.array(Image.open(io.BytesIO(
            z.read("00000/img00000000.png"))))
    assert img.shape == (64, 64, 3)
    assert img[:8].max() == 0 and img[-8:].max() == 0   # letterbox bands
    assert img[32].min() > 0


def test_validation_errors(tmp_path):
    import click
    src = str(tmp_path / "src")
    os.makedirs(src)
    Image.fromarray(np.zeros((40, 40, 3), np.uint8)).save(
        os.path.join(src, "a.png"))
    with pytest.raises(click.ClickException, match="power of two"):
        convert(src, str(tmp_path / "x.zip"))

    src2 = str(tmp_path / "src2")
    os.makedirs(src2)
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
        os.path.join(src2, "a.png"))
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(
        os.path.join(src2, "b.png"))
    with pytest.raises(click.ClickException, match="attributes"):
        convert(src2, str(tmp_path / "y.zip"))
