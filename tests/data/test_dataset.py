"""Golden-sequence data-pipeline tests.

Mirrors the reference's test_units/data/test_dataset.py: exact label
sequences for the interleaved datasets with block_bound on/off, triplet −1
placement, the mixed class+triplet dataset, and the _block_iter/_shuffle_repeat
/_random_upsample building blocks. Deterministic (non-shuffled) sequences are
identical to the reference's goldens; seeded-shuffle tests pin determinism
(numpy seeding differs from TF's Philox, so the exact permutation is ours).
"""

import numpy as np
import pytest
from PIL import Image

from chambers_tpu.data import (
    Dataset,
    InterleaveImageClassDataset,
    InterleaveImageClassTripletDataset,
    InterleaveImageTripletDataset,
    SequentialImageDataset,
    match_img_files,
    match_nested_set,
    set_n_parallel,
)
from chambers_tpu.data.dataset import (
    _block_iter,
    _get_input_len,
    _random_upsample,
    _shuffle_repeat,
)

NC = 5  # class_cycle_length
NB = 2  # images_per_block


@pytest.fixture(scope="module")
def mnist_dir(tmp_path_factory):
    """10 class dirs x 3 tiny images, like the reference's sample mnist."""
    root = tmp_path_factory.mktemp("mnist") / "train"
    rng = np.random.RandomState(0)
    for digit in range(10):
        d = root / str(digit)
        d.mkdir(parents=True)
        for i in range(3):
            arr = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.png")
    return str(root)


@pytest.fixture(scope="module")
def triplets_dir(tmp_path_factory):
    """5 triplet dirs with 2 anchor, 2 positive, 4 negative images each."""
    root = tmp_path_factory.mktemp("triplets") / "train"
    rng = np.random.RandomState(1)
    for t in range(5):
        base = root / f"triplet_{t}"
        for sub, count in (("anchor", 2), ("positive", 2), ("negative", 4)):
            d = base / sub
            d.mkdir(parents=True)
            for i in range(count):
                arr = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{sub}_{i}.png")
    return str(root)


def _labels(dataset, batched=False):
    if batched:
        return [int(y) for xb, yb in dataset for y in yb]
    return [int(y) for x, y in dataset]


class TestGetInputLen:
    def test_strings(self):
        assert _get_input_len(("a", "b")) == 2

    def test_nested(self):
        assert _get_input_len((["a", "b", "c"], [1, 2, 3])) == 3

    def test_scalar_raises(self):
        with pytest.raises(ValueError):
            _get_input_len(5)


class TestImageClassDataset:
    def _build(self, mnist_dir, **kwargs):
        class_dirs = sorted(match_nested_set(mnist_dir))
        labels = list(range(len(class_dirs)))
        defaults = dict(
            class_dirs=class_dirs, labels=labels, class_cycle_length=NC,
            images_per_block=NB, image_channels=3, block_bound=True,
            sample_block_random=False, shuffle=False,
            reshuffle_iteration=False, buffer_size=1024, seed=None,
            repeats=None,
        )
        defaults.update(kwargs)
        return InterleaveImageClassDataset(**defaults)

    def test_block_bound_on_golden(self, mnist_dir):
        """Reference golden (test_dataset.py:101)."""
        td = self._build(mnist_dir)
        golden = [0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9]
        assert _labels(td) == golden
        assert _labels(td.batch(NC * NB), batched=True) == golden

    def test_shard_partitions_interleaved_sequence(self, mnist_dir):
        """tf.data ``shard`` semantics over the interleaved stream: 2-way
        sharding partitions the golden sequence into its even/odd elements
        and loses nothing (SURVEY.md §2.8 multi-host input plan)."""
        golden = [0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9]
        shard0 = _labels(self._build(mnist_dir).shard(2, 0))
        shard1 = _labels(self._build(mnist_dir).shard(2, 1))
        assert shard0 == golden[0::2]
        assert shard1 == golden[1::2]
        merged = [v for pair in zip(shard0, shard1) for v in pair]
        assert merged == golden

    def test_shard_validates_arguments(self, mnist_dir):
        td = self._build(mnist_dir)
        with pytest.raises(ValueError):
            td.shard(0, 0)
        with pytest.raises(ValueError):
            td.shard(2, 2)

    def test_block_bound_off_golden(self, mnist_dir):
        """Reference golden (test_dataset.py:124): 3 files/class with K=2
        leaves a 1-image tail round before the next class cohort."""
        td = self._build(mnist_dir, block_bound=False)
        golden = [0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 0, 1, 2, 3, 4,
                  5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 5, 6, 7, 8, 9]
        assert _labels(td) == golden
        assert _labels(td.batch(NC * NB), batched=True) == golden

    def test_seeded_shuffle_is_deterministic(self, mnist_dir):
        kwargs = dict(block_bound=True, sample_block_random=True, shuffle=True,
                      reshuffle_iteration=False, seed=42)
        seq1 = _labels(self._build(mnist_dir, **kwargs))
        seq2 = _labels(self._build(mnist_dir, **kwargs))
        assert seq1 == seq2
        assert seq1 != _labels(self._build(mnist_dir))  # actually shuffled
        # P-K structure: pairs of identical labels covering all 10 classes
        assert sorted(seq1) == sorted([c for c in range(10) for _ in range(2)])
        assert all(seq1[i] == seq1[i + 1] for i in range(0, 20, 2))

    def test_images_decoded(self, mnist_dir):
        td = self._build(mnist_dir)
        x, y = next(iter(td))
        assert x.shape == (8, 8, 3) and x.dtype == np.uint8

    def test_set_n_parallel(self, mnist_dir):
        set_n_parallel(3)
        td = self._build(mnist_dir)
        assert td._num_parallel_calls == 3
        set_n_parallel(-1)
        td = self._build(mnist_dir)
        assert td._num_parallel_calls == -1


class TestImageTripletDataset:
    def _build(self, triplets_dir, **kwargs):
        class_dirs = sorted(match_nested_set(triplets_dir))
        labels = list(range(len(class_dirs)))
        defaults = dict(
            class_dirs=class_dirs, labels=labels, class_cycle_length=NC,
            images_per_block=NB, image_channels=3, block_bound=True,
            sample_block_random=False, shuffle=False,
            reshuffle_iteration=False, buffer_size=1024, seed=None,
            repeats=None,
        )
        defaults.update(kwargs)
        return InterleaveImageTripletDataset(**defaults)

    def test_block_bound_on_golden(self, triplets_dir):
        """K=2 -> 1 positive (real label) + 1 negative (−1) per triplet dir
        (reference golden shape, test_dataset.py:180)."""
        td = self._build(triplets_dir)
        golden = [0, -1, 1, -1, 2, -1, 3, -1, 4, -1]
        assert _labels(td) == golden
        assert _labels(td.batch(NC * NB), batched=True) == golden

    def test_block_bound_off(self, triplets_dir):
        """Unbounded: each dir yields 4 pos (anchor+positive) with the label
        then 4 negatives with −1, interleaved in K=2 blocks."""
        td = self._build(triplets_dir, block_bound=False)
        seq = _labels(td)
        # per class: 4 pos + 4 neg = 8 elements; 5 dirs -> 40 elements
        assert len(seq) == 40
        for label in range(5):
            assert seq.count(label) == 4
        assert seq.count(-1) == 20
        # first full cycle: two positives from each of the first 5 dirs
        assert seq[:10] == [0, 0, 1, 1, 2, 2, 3, 3, 4, 4]

    def test_seeded_shuffle_deterministic(self, triplets_dir):
        kwargs = dict(sample_block_random=True, shuffle=True,
                      reshuffle_iteration=False, seed=42)
        seq1 = _labels(self._build(triplets_dir, **kwargs))
        assert seq1 == _labels(self._build(triplets_dir, **kwargs))
        assert sorted(seq1) == sorted([0, 1, 2, 3, 4] + [-1] * 5)


class TestInterleaveImageClassTripletDataset:
    def _build(self, mnist_dir, triplets_dir, **kwargs):
        class_dirs = sorted(match_nested_set(mnist_dir))
        class_dirs.extend(sorted(match_nested_set(triplets_dir)))
        labels = list(range(len(class_dirs)))
        defaults = dict(
            class_dirs=class_dirs, labels=labels, class_cycle_length=NC,
            images_per_block=NB, image_channels=3, block_bound=True,
            sample_block_random=False, shuffle=False,
            reshuffle_iteration=False, buffer_size=1024, seed=None,
            repeats=None,
        )
        defaults.update(kwargs)
        return InterleaveImageClassTripletDataset(**defaults)

    def test_block_bound_on_golden(self, mnist_dir, triplets_dir):
        """Reference golden shape (test_dataset.py:271): class dirs emit
        [l, l], triplet dirs emit [l, −1]."""
        td = self._build(mnist_dir, triplets_dir)
        golden = [0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9,
                  10, -1, 11, -1, 12, -1, 13, -1, 14, -1]
        assert _labels(td) == golden
        assert _labels(td.batch(NC * NB), batched=True) == golden


class TestSequentialImageDataset:
    def test_sequential(self, mnist_dir):
        class_dirs = sorted(match_nested_set(mnist_dir))
        labels = list(range(len(class_dirs)))
        td = SequentialImageDataset(class_dirs=class_dirs, labels=labels)
        seq = _labels(td)
        assert seq == [c for c in range(10) for _ in range(3)]


class TestBlockIter:
    def test_random_upsample_pads(self):
        up = _random_upsample(list(range(10)), 20, seed=0)
        assert len(up) == 20
        assert up[:10] == list(range(10))

    def test_random_upsample_noop(self):
        assert _random_upsample(list(range(10)), 10) == list(range(10))

    def test_block_iter_unbounded(self, mnist_dir):
        files = match_img_files(f"{mnist_dir}/0")
        block = list(_block_iter(files, 0, 2, block_bound=False))
        assert [str(f) for f, y in block] == files
        assert all(int(y) == 0 for f, y in block)

    def test_block_iter_bounded(self, mnist_dir):
        files = match_img_files(f"{mnist_dir}/0")
        block = list(_block_iter(files, 0, 2, block_bound=True))
        assert [str(f) for f, y in block] == files[:2]

    def test_block_iter_upsamples_small_class(self, mnist_dir):
        files = match_img_files(f"{mnist_dir}/0")  # 3 files
        block = list(_block_iter(files, 0, 7, block_bound=True, seed=0))
        assert len(block) == 7

    def test_block_iter_random(self, mnist_dir):
        files = match_img_files(f"{mnist_dir}/0")
        b1 = [str(f) for f, y in _block_iter(files, 0, 3, block_bound=True,
                                             sample_block_random=True, seed=1)]
        b2 = [str(f) for f, y in _block_iter(files, 0, 3, block_bound=True,
                                             sample_block_random=True, seed=2)]
        assert sorted(b1) == sorted(files)
        assert b1 != files or b2 != files  # at least one seed permutes


class TestShuffleRepeat:
    slices = list(range(10))

    def _ds(self):
        return Dataset.from_tensor_slices(np.asarray(self.slices))

    def test_noop(self):
        td = _shuffle_repeat(self._ds(), shuffle=False)
        assert [int(x) for x in td] == self.slices

    def test_repeat(self):
        td = _shuffle_repeat(self._ds(), shuffle=False, repeats=3)
        assert len(list(td)) == 30

    def test_invalid_repeats(self):
        with pytest.raises(ValueError):
            _shuffle_repeat(self._ds(), repeats=0)

    def test_shuffle_changes_order(self):
        td = _shuffle_repeat(self._ds(), shuffle=True, buffer_size=10, seed=3)
        assert [int(x) for x in td] != self.slices

    def test_no_reshuffle_repeats_same_order(self):
        td = _shuffle_repeat(
            self._ds(), shuffle=True, buffer_size=10,
            reshuffle_iteration=False, seed=1, repeats=2,
        )
        out = [int(x) for x in td]
        assert out[:10] == out[10:]

    def test_reshuffle_each_iteration(self):
        td = _shuffle_repeat(
            self._ds(), shuffle=True, buffer_size=10,
            reshuffle_iteration=True, seed=1, repeats=2,
        )
        out = [int(x) for x in td]
        assert out[:10] != out[10:]
        assert sorted(out[:10]) == sorted(out[10:]) == self.slices


class TestFusedBatchDecode:
    """decode=True datasets fuse `.batch()` into whole-batch native decode
    (data/dataset.py _DecodedImageDataset) — output must be identical to
    per-element decode + stack, and per-element iteration must still work."""

    @pytest.fixture(scope="class")
    def jpeg_root(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("jpeg_classes")
        rng = np.random.RandomState(7)
        dirs = []
        for c in range(4):
            d = root / f"class_{c}"
            d.mkdir()
            for i in range(6):
                arr = rng.randint(0, 256, (16, 24, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{i}.jpg", quality=95)
            dirs.append(str(d))
        return dirs

    def _make(self, dirs, **kw):
        return InterleaveImageClassDataset(
            dirs, list(range(len(dirs))), class_cycle_length=2,
            images_per_block=3, **kw)

    def test_batch_matches_elementwise(self, jpeg_root):
        batches = list(self._make(jpeg_root).batch(5))
        elements = list(self._make(jpeg_root))
        assert sum(len(y) for _, y in batches) == len(elements)
        flat_imgs = [img for x, _ in batches for img in x]
        flat_labels = [l for _, y in batches for l in y]
        for (img, lab), bimg, blab in zip(elements, flat_imgs, flat_labels):
            np.testing.assert_array_equal(img, bimg)
            assert lab == blab

    def test_batch_matches_paths_route(self, jpeg_root):
        """decode=True fused batches == decode=False + manual batch decode."""
        from chambers_tpu.data.io import read_and_decode_image_batch

        fused = list(self._make(jpeg_root).batch(4, drop_remainder=True))
        manual = [
            (read_and_decode_image_batch(f), np.asarray(y))
            for f, y in self._make(jpeg_root, decode=False).batch(
                4, drop_remainder=True)
        ]
        assert len(fused) == len(manual)
        for (fx, fy), (mx, my) in zip(fused, manual):
            np.testing.assert_array_equal(fx, mx)
            np.testing.assert_array_equal(fy, my)

    def test_decoded_elements_match_pil(self, jpeg_root):
        from PIL import Image as PILImage

        ds = self._make(jpeg_root)
        paths = list(self._make(jpeg_root, decode=False))
        for (img, lab), (path, plab) in zip(ds, paths):
            ref = np.asarray(PILImage.open(path).convert("RGB"), np.uint8)
            np.testing.assert_array_equal(img, ref)
            assert lab == plab

    def test_mixed_sizes_still_iterate(self, jpeg_root, tmp_path):
        """PNG classes (non-JPEG -> per-element fallback inside the chunk)
        decode correctly through the fused dataset."""
        d = tmp_path / "png_class"
        d.mkdir()
        rng = np.random.RandomState(8)
        arrs = [rng.randint(0, 256, (10, 12, 3), np.uint8) for _ in range(3)]
        for i, a in enumerate(arrs):
            Image.fromarray(a).save(d / f"{i}.png")
        ds = InterleaveImageClassDataset(
            [str(d)], [0], class_cycle_length=1, images_per_block=3)
        out = [img for img, _ in ds]
        for got, ref in zip(out, arrs):
            np.testing.assert_array_equal(got, ref)  # png is lossless


class TestMatchImgFilesCache:
    @staticmethod
    def _settle(path):
        """Backdate the dir mtime so the listing cache treats it as settled
        (fresh dirs are deliberately never cached — coarse mtime ticks)."""
        import os
        import time

        old = time.time() - 10
        os.utime(path, (old, old))

    def test_listing_updates_when_dir_changes(self, tmp_path):
        rng = np.random.RandomState(9)
        arr = rng.randint(0, 256, (8, 8, 3), np.uint8)
        Image.fromarray(arr).save(tmp_path / "a.jpg", quality=90)
        self._settle(tmp_path)
        first = match_img_files(str(tmp_path))
        assert [f.split("/")[-1] for f in first] == ["a.jpg"]
        from chambers_tpu.data.io import _MATCH_CACHE

        assert str(tmp_path) + "/" in _MATCH_CACHE  # settled dir was cached
        Image.fromarray(arr).save(tmp_path / "b.jpg", quality=90)
        second = match_img_files(str(tmp_path))
        assert [f.split("/")[-1] for f in second] == ["a.jpg", "b.jpg"]

    def test_fresh_dir_not_cached(self, tmp_path):
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(
            tmp_path / "a.jpg", quality=90)
        match_img_files(str(tmp_path))
        from chambers_tpu.data.io import _MATCH_CACHE

        assert str(tmp_path) + "/" not in _MATCH_CACHE

    def test_cached_listing_not_aliased(self, tmp_path):
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(
            tmp_path / "a.jpg", quality=90)
        self._settle(tmp_path)
        first = match_img_files(str(tmp_path))
        first.append("mutated")
        assert match_img_files(str(tmp_path))[-1] != "mutated"
