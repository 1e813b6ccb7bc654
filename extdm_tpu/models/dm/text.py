"""Optional BERT text conditioning.

Mirrors /root/reference/model/BaseDM_adaptor/text.py:1-88 (tokenize +
bert_embed via a pretrained BERT; wired but unused in all trained configs —
`use_bert_text_cond=False`). Uses the local `transformers` package; in the
no-egress environment the pretrained weights must already be cached or
passed via `model_dir`, otherwise a clear error is raised at call time
(the rest of the framework never imports this module).
"""
from __future__ import annotations

from functools import lru_cache
from typing import List, Optional

import numpy as np

BERT_MODEL_DIM = 768
MAX_LENGTH = 256


@lru_cache(maxsize=1)
def _load(model_dir: Optional[str] = None):
    try:
        from transformers import BertModel, BertTokenizer
    except ImportError as e:  # pragma: no cover
        raise ImportError("transformers is required for text conditioning") from e
    name = model_dir or "bert-base-cased"
    tokenizer = BertTokenizer.from_pretrained(name)
    model = BertModel.from_pretrained(name)
    model.eval()
    return tokenizer, model


def tokenize(texts: List[str], model_dir: Optional[str] = None):
    tokenizer, _ = _load(model_dir)
    return tokenizer(texts, padding="max_length", truncation=True,
                     max_length=MAX_LENGTH, return_tensors="pt")


def bert_embed(token_batch, return_cls_repr: bool = False,
               model_dir: Optional[str] = None) -> np.ndarray:
    """(B, L) tokens -> (B, 768) embeddings: CLS token or masked mean
    (reference semantics)."""
    import torch

    _, model = _load(model_dir)
    with torch.no_grad():
        out = model(input_ids=token_batch["input_ids"],
                    attention_mask=token_batch["attention_mask"])
    hidden = out.last_hidden_state  # (B, L, 768)
    if return_cls_repr:
        return hidden[:, 0].numpy()
    mask = token_batch["attention_mask"][..., None].float()
    emb = (hidden * mask).sum(1) / mask.sum(1).clamp(min=1)
    return emb.numpy()
