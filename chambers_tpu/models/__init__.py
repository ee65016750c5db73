from chambers_tpu.models.generation import (
    apply_top_k_top_p,
    beam_search_decode,
    greedy_decode,
    sample_decode,
)
from chambers_tpu.models.model import Model
from chambers_tpu.models.transformer import Seq2SeqTransformer
