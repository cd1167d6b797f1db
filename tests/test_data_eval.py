"""Data pipeline and eval-metric tests."""

import json
import os

import numpy as np
import pytest

from lavie_tpu.data import DataLoader, MSRVTTDataset, UCF101Dataset, VideoFolderDataset
from lavie_tpu.data import transforms as T
from lavie_tpu.eval import compute_fvd, frechet_distance
from lavie_tpu.eval.clipsim import CLIPSimilarityScorer, clip_preprocess
from lavie_tpu.eval.fvd import FVDFeatureExtractor


@pytest.fixture()
def video_dir(tmp_path):
    rng = np.random.RandomState(0)
    for name in ("a_cat_jumping", "a_dog_running"):
        np.save(tmp_path / f"{name}.npy", (rng.rand(10, 32, 48, 3) * 255).astype(np.uint8))
    return str(tmp_path)


class TestTransforms:
    def test_resize_bilinear_identity(self):
        v = np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32)
        np.testing.assert_array_equal(T.resize_bilinear(v, (8, 8)), v)

    def test_resize_bilinear_constant(self):
        v = np.full((1, 7, 9, 3), 3.5, np.float32)
        out = T.resize_bilinear(v, (5, 4))
        np.testing.assert_allclose(out, 3.5, rtol=1e-6)
        assert out.shape == (1, 5, 4, 3)

    def test_temporal_crop_and_pad(self):
        idx = T.temporal_crop_indices(100, 16, rng=np.random.RandomState(0))
        assert len(idx) == 16 and idx.max() < 100
        v = np.zeros((5, 2, 2, 3))
        assert T.pad_or_truncate(v, 16).shape[0] == 16
        assert T.pad_or_truncate(v, 3).shape[0] == 3


class TestDatasets:
    def test_video_folder(self, video_dir):
        ds = VideoFolderDataset(video_dir, num_frames=4, size=(16, 16))
        assert len(ds) == 2
        s = ds[0]
        assert s["video"].shape == (4, 16, 16, 3)
        assert -1.01 <= s["video"].min() and s["video"].max() <= 1.01
        assert s["caption"] == "a cat jumping"

    def test_msrvtt_split_filtering(self, video_dir, tmp_path):
        ann = {
            "videos": [
                {"video_id": "a_cat_jumping", "split": "train"},
                {"video_id": "a_dog_running", "split": "test"},
            ],
            "sentences": [
                {"video_id": "a_cat_jumping", "caption": "a cat"},
                {"video_id": "a_dog_running", "caption": "a dog"},
            ],
        }
        p = tmp_path / "ann.json"
        p.write_text(json.dumps(ann))
        ds = MSRVTTDataset(video_dir, str(p), split="train", num_frames=4, size=(16, 16))
        assert len(ds) == 1
        assert ds[0]["caption"] == "a cat"

    def test_ucf_csv(self, video_dir, tmp_path):
        csv_p = tmp_path / "test.csv"
        csv_p.write_text("a_cat_jumping.npy,CatJumping\nmissing.npy,Nope\n")
        ds = UCF101Dataset(video_dir, str(csv_p), num_frames=4, size=(16, 16))
        assert len(ds) == 2
        assert ds[0]["label"] == "CatJumping"
        assert ds[1] is None  # missing file → None, filtered by loader

    def test_loader_prefetch_and_filtering(self, video_dir, tmp_path):
        csv_p = tmp_path / "test.csv"
        csv_p.write_text("a_cat_jumping.npy,Cat\nmissing.npy,Nope\na_dog_running.npy,Dog\n")
        ds = UCF101Dataset(video_dir, str(csv_p), num_frames=2, size=(8, 8))
        dl = DataLoader(ds, batch_size=3, shuffle=False, num_workers=2, drop_last=False)
        batches = list(dl)
        assert len(batches) == 1
        # the missing sample was dropped
        assert batches[0]["video"].shape == (2, 2, 8, 8, 3)


class TestFVD:
    def test_frechet_identical_is_zero(self):
        f = np.random.RandomState(0).randn(64, 8)
        assert frechet_distance(f, f) == pytest.approx(0.0, abs=1e-6)

    def test_frechet_orders_distributions(self):
        rng = np.random.RandomState(0)
        a = rng.randn(128, 4)
        near = rng.randn(128, 4) + 0.1
        far = rng.randn(128, 4) + 3.0
        assert frechet_distance(a, near) < frechet_distance(a, far)

    @pytest.mark.slow  # R3D feature pass ~10s
    def test_compute_fvd_runs(self):
        rng = np.random.RandomState(0)
        real = (rng.rand(4, 4, 32, 32, 3) * 255).astype(np.uint8)
        fake = (rng.rand(4, 4, 32, 32, 3) * 255).astype(np.uint8)
        ext = FVDFeatureExtractor(num_frames=4, size=32)
        val = compute_fvd(real, fake, extractor=ext)
        assert np.isfinite(val) and val >= 0


class TestCLIPSIM:
    def test_scorer_contract(self):
        from lavie_tpu.core.config import CLIPTextConfig
        from lavie_tpu.nn.clip import CLIPVisionConfig

        scorer = CLIPSimilarityScorer(
            text_config=CLIPTextConfig.vit_l().tiny(),
            vision_config=CLIPVisionConfig().tiny(),
        )
        video = (np.random.RandomState(0).rand(3, 32, 32, 3) * 255).astype(np.uint8)
        s = scorer.score(video, "a cat")
        assert -1.0 <= s <= 1.0

    def test_preprocess_range(self):
        v = (np.random.RandomState(0).rand(2, 40, 40, 3) * 255).astype(np.uint8)
        out = clip_preprocess(v, 28)
        assert out.shape == (2, 28, 28, 3)
        assert np.abs(out).max() < 3.0

    def test_preprocess_matches_pil_bicubic(self):
        """clip_preprocess must match the `clip` package transform the
        reference scores with (base/pipelines/fine_tuning.py:718): PIL
        BICUBIC shorter-side resize → center crop → /255 → mean/std."""
        PIL = pytest.importorskip("PIL.Image")
        from lavie_tpu.eval.clipsim import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

        size = 32
        v = (np.random.RandomState(1).rand(2, 48, 80, 3) * 255).astype(np.uint8)
        ours = clip_preprocess(v, size)

        h, w = 48, 80
        scale = size / min(h, w)
        nh, nw = max(size, round(h * scale)), max(size, round(w * scale))
        ref = []
        for f in v:
            img = PIL.fromarray(f).resize((nw, nh), PIL.BICUBIC)
            arr = np.asarray(img, np.float32)
            y0, x0 = (nh - size) // 2, (nw - size) // 2
            arr = arr[y0 : y0 + size, x0 : x0 + size] / 255.0
            ref.append((arr - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD)
        ref = np.stack(ref)
        # jax.image cubic vs PIL bicubic differ in antialias filter detail;
        # agreement to a few least-significant uint8 counts is parity here
        assert np.abs(ours - ref).max() < 0.15
        assert np.abs(ours - ref).mean() < 0.02


class TestFVDPreprocess:
    def test_small_video_zero_padded_to_crop(self):
        """torchvision CenterCrop(270) PADS sides smaller than 270 with
        zeros (it does not crop to the min side) — the padded border must
        survive into the normalized output as the -mean/std constant."""
        from lavie_tpu.eval.fvd import IMAGENET_MEAN, IMAGENET_STD, fvd_preprocess

        v = np.full((1, 4, 256, 256, 3), 255, np.uint8)
        out = fvd_preprocess(v, num_frames=4, crop=270, size=224)
        assert out.shape == (1, 4, 224, 224, 3)
        border = out[0, 0, 0, 0]          # padded corner pixel
        center = out[0, 0, 112, 112]      # interior pixel (value 1.0)
        np.testing.assert_allclose(border, (0 - IMAGENET_MEAN) / IMAGENET_STD, atol=1e-5)
        np.testing.assert_allclose(center, (1 - IMAGENET_MEAN) / IMAGENET_STD, atol=1e-5)

    def test_large_video_center_cropped(self):
        from lavie_tpu.eval.fvd import fvd_preprocess

        v = np.zeros((1, 4, 300, 400, 3), np.uint8)
        v[:, :, 15:285, 65:335] = 255     # exactly the center 270x270 window
        out = fvd_preprocess(v, num_frames=4, crop=270, size=224)
        # everything kept should be the bright window — no zero border rows
        assert (out[0, 0].std(axis=(0, 1)) < 1e-3).all()


class TestMSVDDataset:
    def test_annotation_captions_and_augment(self, video_dir, tmp_path):
        """reference: base/pipelines/msvd.py:9-103 — id→caption annotation
        file, mid-frame sample, flip/brightness augmentation keeps range."""
        from lavie_tpu.data import MSVDDataset

        ann = tmp_path / "annotations.txt"
        ann.write_text(
            "a_cat_jumping a cat jumps high\n"
            "a_cat_jumping a cat leaps\n"
            "a_dog_running a dog runs\n"
        )
        ds = MSVDDataset(video_dir, str(ann), num_frames=4, size=(16, 16),
                         augment=False, seed=0)
        caps = {ds[i]["caption"] for i in range(len(ds))}
        assert "a dog runs" in caps
        assert caps & {"a cat jumps high", "a cat leaps"}

        ds_aug = MSVDDataset(video_dir, str(ann), num_frames=4, size=(16, 16),
                             augment=True, seed=1)
        for i in range(len(ds_aug)):
            v = ds_aug[i]["video"]
            assert v.shape == (4, 16, 16, 3)
            assert -1.01 <= v.min() and v.max() <= 1.01
