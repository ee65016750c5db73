"""data.io tests (reference test_units/data/test_io.py): glob ordering and
decode shapes/dtypes, on generated fixtures (no checked-in binaries)."""

import os

import numpy as np
import pytest

from chambers_tpu.data.io import match_img_files, read_and_decode_image


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 256, (24, 32, 3), np.uint8)
    gray = rng.randint(0, 256, (24, 32), np.uint8)
    Image.fromarray(rgb).save(d / "b.png")
    Image.fromarray(rgb).save(d / "a.jpg", quality=95)
    Image.fromarray(rgb).save(d / "c.bmp")
    Image.fromarray(gray).save(d / "gray.png")
    frames = [Image.fromarray(rng.randint(0, 256, (24, 32, 3), np.uint8))
              for _ in range(3)]
    frames[0].save(d / "anim.gif", save_all=True, append_images=frames[1:])
    (d / "notes.txt").write_text("not an image")
    return d


def test_match_img_files_globs_images_only(image_dir):
    files = [os.path.basename(f) for f in match_img_files(str(image_dir))]
    assert "notes.txt" not in files
    assert {"a.jpg", "b.png", "c.bmp", "gray.png", "anim.gif"} <= set(files)
    # ordering contract (reference io.py:33-51): one tf.io.matching_files
    # call per extension pattern, concatenated — sorted within each
    # extension group, groups in VALID_IMAGE_EXTENTIONS order
    from chambers_tpu.data.io import VALID_IMAGE_EXTENTIONS

    by_ext = {os.path.splitext(f)[1][1:] for f in files}
    order = {e: i for i, e in enumerate(VALID_IMAGE_EXTENTIONS)}
    keys = [(order[os.path.splitext(f)[1][1:]], f) for f in files]
    assert keys == sorted(keys)
    assert by_ext <= set(VALID_IMAGE_EXTENTIONS)


@pytest.mark.parametrize("name", ["a.jpg", "b.png", "c.bmp"])
def test_decode_shapes_rgb(image_dir, name):
    arr = read_and_decode_image(str(image_dir / name))
    assert arr.shape == (24, 32, 3) and arr.dtype == np.uint8


def test_decode_png_is_lossless(image_dir):
    arr = read_and_decode_image(str(image_dir / "b.png"))
    from PIL import Image

    want = np.asarray(Image.open(image_dir / "b.png").convert("RGB"))
    np.testing.assert_array_equal(arr, want)


def test_decode_gray_to_channels(image_dir):
    one = read_and_decode_image(str(image_dir / "gray.png"), channels=1)
    assert one.shape == (24, 32, 1)
    three = read_and_decode_image(str(image_dir / "gray.png"), channels=3)
    assert three.shape == (24, 32, 3)
    # grayscale replicated across RGB
    np.testing.assert_array_equal(three[..., 0], three[..., 1])
    np.testing.assert_array_equal(three[..., 0], one[..., 0])


def test_decode_gif_first_frame(image_dir):
    """expand_animations=False semantics: first frame only."""
    arr = read_and_decode_image(str(image_dir / "anim.gif"))
    assert arr.shape == (24, 32, 3) and arr.dtype == np.uint8


def test_cv2_and_pil_paths_agree(image_dir):
    """The cv2 fast path must match the PIL fallback on still images."""
    cv2 = pytest.importorskip("cv2")
    del cv2
    import chambers_tpu.data.io as cio
    from PIL import Image

    for name in ("a.jpg", "b.png", "c.bmp", "gray.png"):
        fast = read_and_decode_image(str(image_dir / name))
        with Image.open(image_dir / name) as img:
            want = np.asarray(img.convert("RGB"), np.uint8)
        np.testing.assert_array_equal(fast, want, err_msg=name)
