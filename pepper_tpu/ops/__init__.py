from .pileup_ref import (
    CandidateWindow,
    RegionalSummary,
    TruthRecord,
)
