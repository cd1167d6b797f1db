from lavie_tpu.pipelines.t2v import TextToVideoPipeline
from lavie_tpu.pipelines.interpolate import VideoInterpolationPipeline
from lavie_tpu.pipelines.vsr import VideoSuperResolutionPipeline
from lavie_tpu.pipelines.cascade import VideoCascadePipeline

__all__ = [
    "TextToVideoPipeline",
    "VideoInterpolationPipeline",
    "VideoSuperResolutionPipeline",
    "VideoCascadePipeline",
]
