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
    """The cv2 fast path must match the PIL fallback: exact on lossless
    formats; within 1 LSB on JPEG (IDCT rounding may differ when the two
    libraries link different libjpeg builds)."""
    cv2 = pytest.importorskip("cv2")
    del cv2
    from PIL import Image

    for name in ("a.jpg", "b.png", "c.bmp", "gray.png"):
        fast = read_and_decode_image(str(image_dir / name))
        with Image.open(image_dir / name) as img:
            want = np.asarray(img.convert("RGB"), np.uint8)
        if name.endswith(".jpg"):
            diff = np.abs(fast.astype(np.int32) - want.astype(np.int32))
            assert diff.max() <= 1, (name, diff.max())
        else:
            np.testing.assert_array_equal(fast, want, err_msg=name)


def test_decode_ignores_exif_orientation(image_dir):
    """Neither the reference's tf.io.decode_jpeg nor the PIL fallback
    auto-rotates by EXIF orientation; the cv2 fast path must not either."""
    from PIL import Image

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (24, 32, 3), np.uint8)
    path = image_dir / "oriented.jpg"
    exif = Image.Exif()
    exif[274] = 6  # Orientation: rotate 90 CW on display
    Image.fromarray(arr).save(path, quality=95, exif=exif)
    out = read_and_decode_image(str(path))
    assert out.shape == (24, 32, 3)  # raw sensor layout, not display layout


def test_decode_16bit_png_consistent_without_cv2(image_dir):
    """16-bit PNGs must decode identically with or without cv2 installed
    (cv2 keeps the high byte, PIL clips — so they stay on the PIL path)."""
    from PIL import Image

    arr16 = (np.arange(24 * 32, dtype=np.uint32) * 7 % 65536).astype(
        np.uint16).reshape(24, 32)
    path = image_dir / "deep.png"
    Image.fromarray(arr16).save(path)  # uint16 array -> 16-bit PNG
    out = read_and_decode_image(str(path))
    with Image.open(path) as img:
        want = np.asarray(img.convert("RGB"), np.uint8)
    np.testing.assert_array_equal(out, want)


def test_decode_dispatches_on_magic_bytes(tmp_path):
    """ADVICE r2: a non-JPEG misnamed .jpg must take the PIL path (content
    sniffing), decoding identically with or without cv2 installed."""
    import numpy as np
    from PIL import Image

    from chambers_tpu.data.io import read_and_decode_image

    arr = (np.arange(16 * 16 * 3, dtype=np.uint32) % 256).astype(np.uint8)
    img = arr.reshape(16, 16, 3)
    path = tmp_path / "actually_png.jpg"
    Image.fromarray(img).save(path, format="PNG")
    out = read_and_decode_image(str(path))
    np.testing.assert_array_equal(out, img)  # lossless PNG round-trip
