"""Cross-framework parity: our flax modules vs the actual torch
implementations the reference uses, with shared (converted) weights.

This is the strongest parity evidence available offline: transformers' torch
CLIPTextModel is exactly what the reference wraps
(reference: base/models/clip.py:32-58), and torch.nn.TransformerDecoder is
exactly what MappingNetwork wraps (reference: base/pipelines/mapping.py:74-76).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from lavie_tpu.core.config import CLIPTextConfig
from lavie_tpu.io.convert import convert_clip_text
from lavie_tpu.nn.clip import CLIPTextModel
from lavie_tpu.nn.mapping import MappingNetwork


class TestCLIPTextParity:
    def test_matches_transformers_torch(self):
        from transformers import CLIPTextConfig as HFConfig
        from transformers import CLIPTextModel as HFModel

        hf_cfg = HFConfig(
            vocab_size=99,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            max_position_embeddings=16,
        )
        torch.manual_seed(0)
        hf = HFModel(hf_cfg).eval()

        ours_cfg = CLIPTextConfig(
            vocab_size=99, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position_embeddings=16,
        )
        ours = CLIPTextModel(config=ours_cfg)
        ids_np = np.array([[1, 5, 7, 42, 2, 2, 2, 2, 9, 9, 9, 9, 3, 3, 3, 3]], np.int32)

        init = ours.init(jax.random.PRNGKey(0), jnp.asarray(ids_np))["params"]
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        params = convert_clip_text(init, sd)

        with torch.no_grad():
            ref = hf(torch.from_numpy(ids_np.astype(np.int64))).last_hidden_state.numpy()
        out = np.asarray(ours.apply({"params": params}, jnp.asarray(ids_np)))
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


class TestMappingNetworkParity:
    def test_matches_torch_transformer_decoder(self):
        """Weights exported from torch's TransformerDecoder → our flax module
        must match outputs (post-LN, relu FFN, self+cross attention)."""
        import torch.nn as tnn

        d, heads, layers, ffn = 16, 2, 2, 32
        torch.manual_seed(0)
        dec_layer = tnn.TransformerDecoderLayer(d_model=d, nhead=heads,
                                                dim_feedforward=ffn)
        dec = tnn.TransformerDecoder(dec_layer, num_layers=layers).eval()

        ours = MappingNetwork(
            input_dim=d, output_dim=d, num_layers=layers, num_heads=heads,
            seq_len_in=5, seq_len_out=4, ffn_dim=ffn,
        )
        # our module includes proj+pos-embeds; to isolate the decoder, zero the
        # pos embeds and make image_proj identity
        rng = np.random.RandomState(0)
        mem_np = rng.randn(2, 5, d).astype(np.float32)
        tgt_np = rng.randn(2, 4, d).astype(np.float32)

        init = ours.init(
            jax.random.PRNGKey(0), jnp.asarray(mem_np), jnp.asarray(tgt_np)
        )["params"]

        # build our params from the torch decoder's weights
        params = jax.tree.map(np.asarray, init)
        params["image_pos_embedding"] = np.zeros_like(params["image_pos_embedding"])
        params["text_pos_embedding"] = np.zeros_like(params["text_pos_embedding"])
        params["image_proj"]["kernel"] = np.eye(d, dtype=np.float32)
        params["image_proj"]["bias"] = np.zeros(d, np.float32)

        tsd = dec.state_dict()
        for i in range(layers):
            pre = f"layers.{i}."
            lp = params[f"layers_{i}"]
            for attn_name, tname in (("self_attn", "self_attn"), ("multihead_attn", "multihead_attn")):
                w_in = tsd[pre + tname + ".in_proj_weight"].numpy()  # (3d, d)
                b_in = tsd[pre + tname + ".in_proj_bias"].numpy()
                for j, proj in enumerate(("q_proj", "k_proj", "v_proj")):
                    lp[attn_name][proj]["kernel"] = w_in[j * d:(j + 1) * d].T
                    lp[attn_name][proj]["bias"] = b_in[j * d:(j + 1) * d]
                lp[attn_name]["out_proj"]["kernel"] = tsd[pre + tname + ".out_proj.weight"].numpy().T
                lp[attn_name]["out_proj"]["bias"] = tsd[pre + tname + ".out_proj.bias"].numpy()
            for lin in ("linear1", "linear2"):
                lp[lin]["kernel"] = tsd[pre + lin + ".weight"].numpy().T
                lp[lin]["bias"] = tsd[pre + lin + ".bias"].numpy()
            for norm in ("norm1", "norm2", "norm3"):
                lp[norm]["scale"] = tsd[pre + norm + ".weight"].numpy()
                lp[norm]["bias"] = tsd[pre + norm + ".bias"].numpy()

        with torch.no_grad():
            ref = dec(
                tgt=torch.from_numpy(tgt_np).permute(1, 0, 2),
                memory=torch.from_numpy(mem_np).permute(1, 0, 2),
            ).permute(1, 0, 2).numpy()
        out = np.asarray(
            ours.apply({"params": jax.tree.map(jnp.asarray, params)},
                       jnp.asarray(mem_np), jnp.asarray(tgt_np))
        )
        np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)
