"""HuggingFace neural embedders as Arrow-batched pandas UDFs.

The reference calls torch/transformers in-process via reticulate
(reference R/embedders.R:9-327): AutoModel text pooling
(``pooler_output`` if present else attention-mask mean pooling,
R/embedders.R:218-227), CLIP/SigLIP multimodal routing
(R/embedders.R:16-17,102-150), image encoders (R/embedders.R:249-326),
always L2-normalizing (R/embedders.R:56 et al.).

Engine design (the Spark shape of the same computation):
- spec = (model_name, modality, device, max_length) — JSON-serializable.
- ``embed_column`` compiles to a SCALAR_ITER ``pandas_udf``: the model
  loads ONCE per Python worker (module-level cache keyed by spec) and
  every Arrow batch runs under ``torch.no_grad()``; Spark's Arrow
  batching replaces the reference's hand-rolled batch-of-32 loop
  (R/core.R:162-197).
- modality routing is EXPLICIT (text vs image column types) instead of
  the reference's file-existence sniffing (R/embedders.R:112), because
  executors cannot see driver-local paths; images arrive as
  ``binary`` columns (spark.read.format("binaryFile")).

torch/transformers are NOT installed in this environment, exactly as
they are optional (Suggests) in the reference — the UDF plumbing below
is real and tested with a deterministic fake encoder; the model-load
step raises ``NotImplementedError`` unless the libraries are present.
"""

from __future__ import annotations

import hashlib
import math
from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tidyvec_spark.embedders.base import (
    EmbedderSpec,
    FittedEmbedder,
    register_embedder,
)

# per-python-worker model cache: spec key -> encoder callable
_MODEL_CACHE: dict[tuple, Any] = {}


def _load_encoder(model_name: str, modality: str, device: str,
                  fake_dim: int | None):
    """Resolve the encoder once per worker. Real path needs torch +
    transformers; the deterministic fake keeps the Spark plumbing
    testable without them."""
    key = (model_name, modality, device, fake_dim)
    if key in _MODEL_CACHE:
        return _MODEL_CACHE[key]
    if fake_dim is not None:
        enc = _FakeEncoder(model_name, modality, fake_dim)
    else:
        try:
            import torch  # noqa: F401
            import transformers  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "HF embedding requires torch+transformers on executors "
                "(ship via spark.archives / conda-pack). Not available in "
                "this environment — use fake_dim for plumbing tests."
            ) from e
        enc = _TorchEncoder(model_name, modality, device)
    _MODEL_CACHE[key] = enc
    return enc


class _FakeEncoder:
    """Deterministic stand-in: hash text/bytes -> unit vector.

    Keeps every Spark-side property of the real path (batch shape,
    dtype, L2 normalization) so plumbing tests are meaningful.
    """

    def __init__(self, model_name: str, modality: str, dim: int):
        self.seed = f"{model_name}:{modality}"
        self.dim = dim

    def __call__(self, items: list) -> np.ndarray:
        out = np.zeros((len(items), self.dim), dtype=np.float32)
        for i, item in enumerate(items):
            if item is None:
                continue
            raw = item if isinstance(item, (bytes, bytearray)) else str(item).encode()
            h = hashlib.sha256(self.seed.encode() + bytes(raw)).digest()
            rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
            v = rng.standard_normal(self.dim).astype(np.float32)
            out[i] = v / (np.linalg.norm(v) or 1.0)
        return out


def _is_siglip(model_name: str) -> bool:
    """SigLIP model-family detection by name (reference
    R/embedders.R:16-17 uses the same regex approach)."""
    import re

    return re.search(r"siglip", model_name, re.IGNORECASE) is not None


class _TorchEncoder:
    """Real HF path, one branch per modality (reference R/embedders.R):

    - text: AutoModel; ``pooler_output`` if present else attention-mask
      mean pooling (R/embedders.R:218-227);
    - image: AutoModel + AutoImageProcessor over PIL images decoded
      from bytes; ``pooler_output`` else global mean pooling
      (R/embedders.R:301-306);
    - multimodal: CLIP (CLIPModel/CLIPProcessor,
      get_text_features/get_image_features, R/embedders.R:102-150) or
      SigLIP (SiglipModel + AutoProcessor, padding="max_length",
      SigLIP2 max_length=64, R/embedders.R:34-101), selected by model
      name; each batch routes per item by *python type* — bytes →
      image, str → text — the executor-safe analog of the reference's
      file-path sniffing (R/embedders.R:112).

    Always L2-normalized (R/embedders.R:56,85,123,133,184,230,267,309).
    Only constructed when torch+transformers import, which they do not
    in this container.
    """

    def __init__(self, model_name: str, modality: str, device: str):
        import torch

        self.torch = torch
        self.device = device
        self.modality = modality
        self.model_name = model_name
        self.siglip = _is_siglip(model_name)
        if modality == "multimodal":
            if self.siglip:
                from transformers import AutoProcessor, SiglipModel

                self.model = SiglipModel.from_pretrained(model_name).to(device).eval()
                self.processor = AutoProcessor.from_pretrained(model_name)
            else:
                from transformers import CLIPModel, CLIPProcessor

                self.model = CLIPModel.from_pretrained(model_name).to(device).eval()
                self.processor = CLIPProcessor.from_pretrained(model_name)
        elif modality == "image":
            from transformers import AutoImageProcessor, AutoModel

            self.model = AutoModel.from_pretrained(model_name).to(device).eval()
            self.processor = AutoImageProcessor.from_pretrained(model_name)
        else:
            from transformers import AutoModel, AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(model_name)
            self.model = AutoModel.from_pretrained(model_name).to(device).eval()

    # -- branch kernels -------------------------------------------------
    def _normalize(self, emb):
        return self.torch.nn.functional.normalize(emb, p=2, dim=1)

    def _pil(self, blobs: list):
        import io

        from PIL import Image

        return [Image.open(io.BytesIO(b)).convert("RGB") for b in blobs]

    def _encode_text(self, texts: list) -> "np.ndarray":
        torch = self.torch
        batch = self.tokenizer(
            texts, truncation=True, padding=True, return_tensors="pt"
        ).to(self.device)
        with torch.no_grad():
            out = self.model(**batch)
        if getattr(out, "pooler_output", None) is not None:
            emb = out.pooler_output
        else:  # attention-mask mean pooling (R/embedders.R:218-227)
            mask = batch["attention_mask"].unsqueeze(-1).float()
            emb = (out.last_hidden_state * mask).sum(1) / mask.sum(1).clamp(min=1e-9)
        return self._normalize(emb).cpu().numpy().astype("float32")

    def _encode_image(self, blobs: list) -> "np.ndarray":
        torch = self.torch
        batch = self.processor(images=self._pil(blobs), return_tensors="pt").to(
            self.device
        )
        with torch.no_grad():
            out = self.model(**batch)
        if getattr(out, "pooler_output", None) is not None:
            emb = out.pooler_output
        else:  # global mean pooling over patches (R/embedders.R:301-306)
            emb = out.last_hidden_state.mean(dim=1)
        return self._normalize(emb).cpu().numpy().astype("float32")

    def _encode_multimodal(self, items: list, is_image: list) -> "np.ndarray":
        torch = self.torch
        kwargs = {"padding": "max_length"} if self.siglip else {"padding": True}
        if self.siglip and "siglip2" in self.model_name.lower():
            kwargs["max_length"] = 64  # R/embedders.R:68-71
        out = None
        texts = [("" if x is None else str(x)) for x, im in zip(items, is_image) if not im]
        blobs = [x for x, im in zip(items, is_image) if im]
        feats: dict[str, Any] = {}
        if texts:
            b = self.processor(
                text=texts, truncation=True, return_tensors="pt", **kwargs
            ).to(self.device)
            with torch.no_grad():
                feats["text"] = self._normalize(self.model.get_text_features(**b))
        if blobs:
            b = self.processor(images=self._pil(blobs), return_tensors="pt").to(
                self.device
            )
            with torch.no_grad():
                feats["image"] = self._normalize(self.model.get_image_features(**b))
        ref = next(iter(feats.values()))
        # allocate on the SAME device/dtype as the feature tensors:
        # indexed assignment from a cuda/mps tensor into a CPU buffer
        # raises a cross-device RuntimeError
        out = torch.zeros((len(items), ref.shape[1]), device=ref.device,
                          dtype=ref.dtype)
        ti = ii = 0
        for i, im in enumerate(is_image):
            if im:
                out[i] = feats["image"][ii]; ii += 1
            else:
                out[i] = feats["text"][ti]; ti += 1
        return out.cpu().numpy().astype("float32")

    def __call__(self, items: list) -> "np.ndarray":
        if self.modality == "image":
            return self._encode_image([b"" if x is None else x for x in items])
        if self.modality == "multimodal":
            is_image = [isinstance(x, (bytes, bytearray)) for x in items]
            return self._encode_multimodal(items, is_image)
        return self._encode_text(["" if x is None else str(x) for x in items])


class HFEmbedder(EmbedderSpec, FittedEmbedder):
    """HuggingFace embedder spec; corpus-stateless so fit == identity."""

    kind = "hf"

    def __init__(
        self,
        model_name: str,
        modality: str = "text",
        device: str = "cpu",
        fake_dim: int | None = None,
    ):
        if modality not in ("text", "image", "multimodal"):
            raise ValueError(f"unknown modality {modality!r}")
        self.model_name = model_name
        self.modality = modality
        self.device = device
        self.fake_dim = fake_dim
        self.dim = fake_dim

    def fit(self, df: DataFrame, content_col: str) -> "HFEmbedder":
        return self

    def embed_column(self, df: DataFrame, content_col: str, out_col: str) -> DataFrame:
        model_name, modality = self.model_name, self.modality
        device, fake_dim = self.device, self.fake_dim

        @F.pandas_udf(T.ArrayType(T.FloatType()))
        def emb(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
            enc = _load_encoder(model_name, modality, device, fake_dim)
            for s in it:
                items = s.astype(object).where(s.notna(), None).tolist()
                mat = enc(items)
                yield pd.Series(
                    [None if items[i] is None else mat[i].tolist()
                     for i in range(len(items))]
                )

        return df.withColumn(out_col, emb(F.col(content_col)))

    def embed_query(self, text: str) -> list[float]:
        enc = _load_encoder(self.model_name, self.modality, self.device,
                            self.fake_dim)
        return [float(x) for x in enc([text])[0]]

    def spec_json(self) -> dict[str, Any]:
        return {
            "kind": "hf",
            "model_name": self.model_name,
            "modality": self.modality,
            "device": self.device,
            "fake_dim": self.fake_dim,
        }


def _rehydrate_hf(spec: dict[str, Any], spark: SparkSession) -> HFEmbedder:
    return HFEmbedder(
        model_name=spec["model_name"],
        modality=spec.get("modality", "text"),
        device=spec.get("device", "cpu"),
        fake_dim=spec.get("fake_dim"),
    )


register_embedder("hf", _rehydrate_hf)
