"""On-TPU models. The local embedding model (BERT encoder) runs on the
same chip as the search engine — the reference runs candle BERT on CPU
(`src/embedding/candle.rs:33,75`); here the forward pass is jitted XLA
and can be fused into the graph-traversal loop for pruned-index search."""

from leann_tpu.models.bert import BertConfig, BertEncoder

__all__ = ["BertConfig", "BertEncoder"]
