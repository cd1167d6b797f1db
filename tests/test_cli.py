"""CLI entry-point smoke tests: the reference's user surface is per-stage
`python sample.py --config <yaml>` scripts chained through the filesystem
(reference: base/pipelines/sample.py:95-100, interpolation/sample.py:303-307,
vsr/sample.py:145-151). Drives each CLI main in-process with tiny configs
and verifies the stage-N → stage-N+1 file chaining actually connects.
"""

import os

import numpy as np
import pytest
import yaml


def _write_cfg(path, cfg):
    with open(path, "w") as fh:
        yaml.safe_dump(cfg, fh)
    return str(path)


@pytest.fixture(scope="module")
def chain_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_chain")
    return {
        "base": str(root / "base"),
        "interp": str(root / "interp"),
        "vsr": str(root / "vsr"),
        "cfg": root,
    }


class TestCLIChain:
    def test_base_sample_cli(self, chain_dirs):
        from lavie_tpu.cli import sample

        cfg = _write_cfg(
            chain_dirs["cfg"] / "base.yaml",
            {
                "model_scale": "tiny",
                "text_prompt": ["a cat"],
                "video_length": 4,
                "image_size": [64, 64],
                "num_sampling_steps": 2,
                "sample_method": "ddim",
                "output_folder": chain_dirs["base"],
                "seed": 1,
            },
        )
        sample.main(["--config", cfg])
        # write_video picks the container the env supports (mp4 via imageio,
        # else the native MJPEG/AVI codec) — assert on the stem
        outs = os.listdir(chain_dirs["base"])
        assert any(o.startswith("a_cat.") for o in outs), outs

    def test_interpolate_cli_chains_from_base(self, chain_dirs):
        from lavie_tpu.cli import interpolate

        if not os.path.isdir(chain_dirs["base"]) or not os.listdir(chain_dirs["base"]):
            pytest.skip("base stage output absent (run the full chain class)")
        cfg = _write_cfg(
            chain_dirs["cfg"] / "interp.yaml",
            {
                # reference nests under `args:` — exercised here
                "args": {
                    "model_scale": "tiny",
                    "input_folder": chain_dirs["base"],
                    "output_folder": chain_dirs["interp"],
                    "num_frames": 5,
                    "num_sampling_steps": 2,
                    "seed": 1,
                }
            },
        )
        interpolate.main(["--config", cfg])
        outs = os.listdir(chain_dirs["interp"])
        assert outs, "interpolation wrote no outputs"

    def test_vsr_cli_chains_from_interp(self, chain_dirs):
        from lavie_tpu.cli import vsr
        from lavie_tpu.io.video import read_video

        if not os.path.isdir(chain_dirs["interp"]) or not os.listdir(chain_dirs["interp"]):
            pytest.skip("interp stage output absent (run the full chain class)")
        cfg = _write_cfg(
            chain_dirs["cfg"] / "vsr.yaml",
            {
                "model_scale": "tiny",
                "input_path": chain_dirs["interp"],
                "output_path": chain_dirs["vsr"],
                "inference_steps": 2,
                "window": 4,
            },
        )
        vsr.main(["--config", cfg])
        outs = sorted(os.listdir(chain_dirs["vsr"]))
        assert outs, "vsr wrote no outputs"
        video = read_video(os.path.join(chain_dirs["vsr"], outs[0]))
        v = np.asarray(video)
        # ×4 upscale of the 64×64 interpolated frames, frame count preserved
        assert v.shape[0] == 5 and v.shape[1] == 256 and v.shape[2] == 256, v.shape


def test_cascade_cli(tmp_path):
    from lavie_tpu.cli import cascade

    out_dir = str(tmp_path / "cascade")
    cfg = _write_cfg(
        tmp_path / "cascade.yaml",
        {
            "model_scale": "tiny",
            "text_prompt": ["a dog"],
            "video_length": 4,
            "image_size": [64, 64],
            "num_sampling_steps": 2,
            "sample_method": "ddim",
            "output_folder": out_dir,
            "seed": 0,
        },
    )
    cascade.main(["--config", cfg])
    assert os.listdir(out_dir), "cascade wrote no outputs"


def test_train_mapping_cli(tmp_path):
    """Standalone mapper pre-training CLI (reference: base/pipelines/
    mapping.py `training_mapping`): two tiny steps over a video folder,
    mapper checkpoint written."""
    import numpy as np

    from lavie_tpu.cli import train_mapping

    vids = tmp_path / "vids"
    vids.mkdir()
    rng = np.random.RandomState(0)
    for name in ("a_cat", "a_dog"):
        np.save(vids / f"{name}.npy",
                (rng.rand(4, 32, 32, 3) * 255).astype(np.uint8))
    out_dir = str(tmp_path / "ckpt")
    cfg = _write_cfg(
        tmp_path / "mapping.yaml",
        {
            "model_scale": "tiny",
            "train_data_dir": str(vids),
            "train_batch_size": 2,
            "max_train_steps": 2,
            "learning_rate": 1e-4,
            "logging_dir": str(tmp_path / "logs"),
            "output_dir": out_dir,
            "seed": 0,
        },
    )
    train_mapping.main(["--config", cfg])
    assert os.path.isdir(os.path.join(out_dir, "mapper"))
