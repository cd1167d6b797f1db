from lavie_tpu.eval.clipsim import CLIPSimilarityScorer
from lavie_tpu.eval.fvd import compute_fvd, frechet_distance

__all__ = ["CLIPSimilarityScorer", "compute_fvd", "frechet_distance"]
