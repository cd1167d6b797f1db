from lavie_tpu.io.tokenizer import CLIPTokenizer

__all__ = ["CLIPTokenizer"]
