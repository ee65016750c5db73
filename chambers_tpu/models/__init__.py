from chambers_tpu.models.generation import (
    beam_search_decode,
    greedy_decode,
    sample_decode,
)
from chambers_tpu.models.model import Model
from chambers_tpu.models.transformer import Seq2SeqTransformer
