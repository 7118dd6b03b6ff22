"""M-tier: ML-model-backed filters (M1-M14) — optional-deps skeletons.

The reference's model filters (CLIP/BLIP/LLaVA/NSFW/watermarks/RAFT,
`filters/images/*`, `filters/text2image/*`, `filters/videos/*`) are
U2 DataFilters whose ``process_batch`` runs GPU inference. Weights make
them non-oracle-checkable (FIXTURES.md §3.4); per the reference's own
CI strategy they are exercised schema-only with a dummy stand-in
(`filters/images/dummy_gpu_filter.py:10-53`).

Here each filter declares its exact result schema and batching, with
inference behind an import-try: without torch the class constructs and
exposes schema (so pipelines can be planned and validated) but
``process_batch`` raises; with torch, subclasses load weights in
``setup()`` — called lazily ONCE PER TASK inside ``mapInPandas``, the
Spark twin of the reference's per-worker model initialization.

GPU topology: set ``spark.task.resource.gpu.amount=1`` so each task
owns a device; ``repartition(n_gpus)`` replaces MultiGPUDataFilter
(`filters/multigpu_filter.py:39-133`) entirely.
"""

from __future__ import annotations

from abc import abstractmethod
from typing import Any

from pyspark.sql.types import DoubleType, StringType

from dataprocessingframework_spark.filters.data_filter import DataFilter

try:
    import torch  # noqa: F401

    HAVE_TORCH = True
except ImportError:
    HAVE_TORCH = False


class ModelFilter(DataFilter):
    """Base for weight-backed filters: lazy per-task setup."""

    def __init__(self, content_column: str = "content", device: str = "cuda") -> None:
        self._content_column = content_column
        self.device = device
        self._ready = False

    @property
    def content_column(self) -> str:
        return self._content_column

    def setup(self) -> None:
        """Load weights once per task (reference: per dataloader run)."""
        if not HAVE_TORCH:
            raise NotImplementedError(
                f"{type(self).__name__} requires torch; install the model "
                "extras to run inference (schema/planning works without)"
            )

    @abstractmethod
    def infer_batch(self, batch: list[Any]) -> dict[str, list[Any]]: ...

    def process_batch(self, batch):
        if not self._ready:
            self.setup()
            self._ready = True
        return self.infer_batch(batch)

    def preprocess(self, data, metadata):
        return data  # CPU decode belongs in subclasses


class AestheticFilter(ModelFilter):
    """M1/M2 — CLIP emb -> MLP score
    (`filters/images/aesthetic_improved_filter.py:74-152`)."""

    @property
    def result_schema(self):
        return [("aesthetic_score", DoubleType())]

    def infer_batch(self, batch):
        raise NotImplementedError("weights not available in this environment")


class CLIPLabelsFilter(ModelFilter):
    """M3 — zero-shot label scores (`filters/images/cliplabels_filter.py:18-129`):
    one double column per label, mean-of-templates text embedding."""

    def __init__(self, labels: list[str], **kw) -> None:
        super().__init__(**kw)
        self.labels = labels

    @property
    def result_schema(self):
        return [(f"clip_score_{label}", DoubleType()) for label in self.labels]

    def infer_batch(self, batch):
        raise NotImplementedError("weights not available in this environment")


class NSFWFilter(ModelFilter):
    """M4 — `filters/images/nsfw_filter.py:67-137`."""

    @property
    def result_schema(self):
        return [("nsfw_score", DoubleType())]

    def infer_batch(self, batch):
        raise NotImplementedError("weights not available in this environment")


class WatermarksFilter(ModelFilter):
    """M5 — `filters/images/watermarks_filter.py:65-149`."""

    @property
    def result_schema(self):
        return [("watermark_score", DoubleType())]

    def infer_batch(self, batch):
        raise NotImplementedError("weights not available in this environment")


class CaptioningFilter(ModelFilter):
    """M8/M9/M14 — captioning (BLIP/LLaVA/VideoLLaVA...)."""

    def __init__(self, prompt: str = "describe", **kw) -> None:
        super().__init__(**kw)
        self.prompt = prompt

    @property
    def result_schema(self):
        return [(f"caption_{self.prompt}", StringType())]

    def infer_batch(self, batch):
        raise NotImplementedError("weights not available in this environment")


class T2ISimilarityFilter(ModelFilter):
    """M10-M12 — text-image similarity diag(image @ text.T)
    (`filters/text2image/clip_filter.py:114-120`)."""

    def __init__(self, text_column: str = "caption", **kw) -> None:
        super().__init__(**kw)
        self.text_column = text_column

    @property
    def metadata_columns(self):
        return [self.text_column]

    @property
    def result_schema(self):
        return [("t2i_similarity", DoubleType())]

    def infer_batch(self, batch):
        raise NotImplementedError("weights not available in this environment")


class DummyGPUFilter(ModelFilter):
    """K10 — CI stand-in (`filters/images/dummy_gpu_filter.py:10-53`):
    runs without torch, constant label, proves the M-tier plumbing."""

    @property
    def result_schema(self):
        return [("dummy_label", StringType())]

    def setup(self) -> None:  # no weights
        pass

    def infer_batch(self, batch):
        return {"dummy_label": ["dummy" for _ in batch]}
