from lavie_tpu.pipelines.t2v import TextToVideoPipeline

__all__ = ["TextToVideoPipeline"]
