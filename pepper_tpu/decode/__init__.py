from .candidate_finder import (
    CandidatePrediction,
    decode_predictions,
    find_candidates,
    repeat_annotation,
)
from .vcf_writer import VCFWriter
