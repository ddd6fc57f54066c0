"""Native C++ image decoder (native_io/, reference C10 analog).

The reference decoded images in host C/C++; here decode.cpp wraps the
system libjpeg/libpng. PNG is lossless so the native decode must match PIL
bit-for-bit; JPEG goes through the same libjpeg family, also exact here.
"""

import numpy as np
import pytest
from PIL import Image

from mobilenet_tpu import native_io
from mobilenet_tpu.ops.preprocess import decode_image_host

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native decoder does not build here")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


@pytest.mark.parametrize("mode,shape", [
    ("RGB", (37, 53, 3)),
    ("RGBA", (20, 30, 4)),   # alpha dropped
    ("L", (25, 31)),         # gray expanded to RGB
])
def test_png_matches_pil_exactly(tmp_path, rng, mode, shape):
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    path = tmp_path / "t.png"
    Image.fromarray(arr, mode=mode).save(path)
    nat = native_io.decode_image(str(path))
    pil = np.asarray(Image.open(path).convert("RGB"))
    assert nat.dtype == np.uint8 and nat.shape == pil.shape
    np.testing.assert_array_equal(nat, pil)


def test_jpeg_matches_pil(tmp_path, rng):
    arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    path = tmp_path / "t.jpg"
    Image.fromarray(arr).save(path, quality=90)
    nat = native_io.decode_image(str(path))
    pil = np.asarray(Image.open(path).convert("RGB"))
    # Same libjpeg family underneath; allow a tiny IDCT-variant margin.
    assert nat.shape == pil.shape
    assert np.abs(nat.astype(int) - pil.astype(int)).max() <= 1


def test_error_paths(tmp_path):
    with pytest.raises(ValueError, match="native decode failed"):
        native_io.decode_image(str(tmp_path / "missing.png"))
    garbage = tmp_path / "garbage.bin"
    garbage.write_bytes(b"notanimage" * 10)
    with pytest.raises(ValueError, match="unrecognized format"):
        native_io.decode_image(str(garbage))
    # Truncated PNG: valid signature, corrupt body.
    img = tmp_path / "trunc.png"
    arr = np.zeros((32, 32, 3), np.uint8)
    Image.fromarray(arr).save(img)
    img.write_bytes(img.read_bytes()[:40])
    with pytest.raises(ValueError):
        native_io.decode_image(str(img))


def test_decode_image_host_backends(tmp_path, rng):
    arr = rng.integers(0, 256, (30, 40, 3), dtype=np.uint8)
    path = tmp_path / "t.png"
    Image.fromarray(arr).save(path)
    nat = decode_image_host(str(path), backend="native")
    pil = decode_image_host(str(path), backend="pil")
    auto = decode_image_host(str(path))
    np.testing.assert_array_equal(nat, pil)
    np.testing.assert_array_equal(auto, pil)
    with pytest.raises(ValueError, match="unknown decode backend"):
        decode_image_host(str(path), backend="opencv")


def test_progressive_jpeg(tmp_path, rng):
    """decode.cpp claims progressive JPEG support — hold it to that."""
    arr = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    path = tmp_path / "prog.jpg"
    Image.fromarray(arr).save(path, quality=85, progressive=True)
    nat = native_io.decode_image(str(path))
    pil = np.asarray(Image.open(path).convert("RGB"))
    assert nat.shape == pil.shape
    assert np.abs(nat.astype(int) - pil.astype(int)).max() <= 1


def test_grayscale_jpeg(tmp_path, rng):
    arr = rng.integers(0, 256, (33, 44), dtype=np.uint8)
    path = tmp_path / "gray.jpg"
    Image.fromarray(arr, mode="L").save(path, quality=90)
    nat = native_io.decode_image(str(path))
    pil = np.asarray(Image.open(path).convert("RGB"))
    assert nat.shape == (33, 44, 3)
    assert np.abs(nat.astype(int) - pil.astype(int)).max() <= 1


def test_decode_batch_matches_single(tmp_path, rng):
    """Thread-pooled batch decode returns exactly the per-image results,
    aligned with the input order (worker scheduling must not reorder)."""
    paths = []
    for i in range(17):  # > default pool size, odd count
        arr = rng.integers(0, 256, (16 + i, 20 + 2 * i, 3), dtype=np.uint8)
        p = tmp_path / f"img_{i:02d}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    batch = native_io.decode_batch(paths, threads=4)
    assert len(batch) == len(paths)
    for p, got in zip(paths, batch):
        np.testing.assert_array_equal(got, native_io.decode_image(p))


def test_decode_batch_empty_and_single_thread(tmp_path, rng):
    assert native_io.decode_batch([]) == []
    arr = rng.integers(0, 256, (12, 14, 3), dtype=np.uint8)
    p = tmp_path / "one.png"
    Image.fromarray(arr).save(p)
    (got,) = native_io.decode_batch([str(p)], threads=1)
    np.testing.assert_array_equal(got, np.asarray(Image.open(p)))


def test_decode_batch_error_isolation(tmp_path, rng):
    """One corrupt file must not poison its neighbors; strict raises with
    the failing path, strict=False yields None in-place."""
    good = tmp_path / "good.png"
    Image.fromarray(rng.integers(0, 256, (10, 10, 3), dtype=np.uint8)).save(good)
    bad = tmp_path / "bad.png"
    bad.write_bytes(good.read_bytes()[:30])
    paths = [str(good), str(bad), str(good)]
    out = native_io.decode_batch(paths, strict=False)
    assert out[1] is None
    np.testing.assert_array_equal(out[0], out[2])
    with pytest.raises(ValueError, match="bad.png"):
        native_io.decode_batch(paths)


def test_load_dir_images_uses_batch_path(tmp_path, rng):
    """Directory eval ingest: images decode (native batch route), non-image
    files are skipped, order is name-sorted."""
    from mobilenet_tpu.runtime.eval import load_dir_images

    shapes = [(24, 24, 3), (30, 20, 3), (18, 36, 3)]
    for i, s in enumerate(shapes):
        Image.fromarray(rng.integers(0, 256, s, dtype=np.uint8)).save(
            tmp_path / f"{i}.png")
    (tmp_path / "notes.txt").write_text("not an image")
    imgs = load_dir_images(str(tmp_path))
    assert [im.shape for im in imgs] == shapes
