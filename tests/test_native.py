"""Native MJPEG/AVI codec tests (C + libjpeg via ctypes)."""

import numpy as np
import pytest

from lavie_tpu.native import mjpeg_available


pytestmark = pytest.mark.skipif(
    not mjpeg_available(), reason="native mjpeg codec not built (no cc/libjpeg)"
)


class TestMJPEGCodec:
    def test_roundtrip_smooth(self, tmp_path):
        from lavie_tpu.native import probe_avi, read_avi, write_avi

        y = np.linspace(0, 255, 48)[None, :, None, None]
        frames = np.broadcast_to(y, (5, 48, 64, 3)).astype(np.uint8).copy()
        p = str(tmp_path / "t.avi")
        write_avi(p, frames, fps=8, quality=95)
        n, h, w, fps = probe_avi(p)
        assert (n, h, w, fps) == (5, 48, 64, 8)
        back = read_avi(p)
        assert back.shape == frames.shape
        assert np.abs(back.astype(int) - frames.astype(int)).max() <= 2

    def test_roundtrip_noise_bounded_error(self, tmp_path):
        from lavie_tpu.native import read_avi, write_avi

        frames = (np.random.RandomState(0).rand(3, 32, 32, 3) * 255).astype(np.uint8)
        p = str(tmp_path / "n.avi")
        write_avi(p, frames, fps=24, quality=95)
        back = read_avi(p)
        # JPEG on uniform noise is the worst case (chroma subsampling + DCT
        # quantization); uncorrelated guessing would give ~85 mean abs error
        assert np.abs(back.astype(float) - frames.astype(float)).mean() < 60

    def test_probe_rejects_non_avi(self, tmp_path):
        from lavie_tpu.native import probe_avi

        p = tmp_path / "x.avi"
        p.write_bytes(b"not an avi at all")
        with pytest.raises(IOError):
            probe_avi(str(p))

    def test_write_video_falls_back_to_avi(self, tmp_path):
        """Without ffmpeg, io.video.write_video should choose the native AVI."""
        from lavie_tpu.io.video import read_video, write_video

        frames = np.zeros((2, 16, 16, 3), np.uint8)
        out = write_video(str(tmp_path / "v.mp4"), frames, fps=8)
        assert out.endswith((".mp4", ".avi"))  # mp4 only if ffmpeg exists
        back = read_video(out)
        assert back.shape == (2, 16, 16, 3)


class TestVideoGrid:
    def test_grid_layout(self, tmp_path):
        from lavie_tpu.io.video import read_video, save_video_grid

        vids = [np.full((2, 8, 8, 3), i * 60, np.uint8) for i in range(3)]
        out = save_video_grid(str(tmp_path / "grid.mp4"), vids, fps=4)
        back = read_video(out)
        assert back.shape[1:] == (16, 16, 3)  # 2x2 grid of 8x8
        assert abs(int(back[0, 0, 0, 0]) - 0) <= 3         # video 0 top-left
        assert abs(int(back[0, 0, 12, 0]) - 60) <= 3       # video 1 top-right
        assert abs(int(back[0, 12, 0, 0]) - 120) <= 3      # video 2 bottom-left
