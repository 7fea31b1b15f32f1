"""Normative constants for image shapes, model sizes and filters.

Behavioral parity source: pepper_variant/modules/python/Options.py:1-99 and
pepper_variant/modules/cpp/region_summary.h:14-51 in the reference repo.
"""

from dataclasses import dataclass


class ImageOptions:
    """Variant-mode candidate image geometry (reference Options.py:5-14)."""

    IMAGE_HEIGHT = 26              # feature channels per pileup column
    CANDIDATE_WINDOW_SIZE = 32     # window = CANDIDATE_WINDOW_SIZE + 1 = 33 columns
    TOTAL_LABELS = 28              # base-pair classes
    TOTAL_TYPE_LABELS = 3          # hom-ref / het / hom-alt
    MAX_COLOR_VALUE = 125          # clamp for counted features (region_summary.h:15)
    MIN_COLOR_VALUE = -125
    # The reference clamps only feature columns [11, 25) after accumulation
    # (region_summary.cpp:648-653 with BASE_INDEX_START=11, BASE_INDEX_SIZE=14).
    CLAMP_COL_START = 11
    CLAMP_COL_END = 25             # exclusive

    DECODED_LABELS = ["HOM-REF", "HET-ALT", "HOM-ALT"]
    DECODED_BASE_LABELS = [
        "RR", "RA", "RC", "RT", "RG", "R*", "R#", "AA", "AC", "AT", "AG",
        "A*", "A#", "CC", "CT", "CG", "C*", "C#", "TT", "TG", "T*", "T#",
        "GG", "G*", "G#", "**", "*#", "##",
    ]


class ImageOptionsHP:
    """HP-mode (haplotagged) image geometry (reference Options.py:17-29)."""

    IMAGE_HEIGHT = 48
    CANDIDATE_WINDOW_SIZE = 20
    TOTAL_LABELS = 28
    TOTAL_TYPE_LABELS = 3
    SEQ_LENGTH = 1000
    SEQ_OVERLAP = 50


class PolishImageOptions:
    """Assembly-polishing image geometry (reference pepper/.../Options.py:1-29)."""

    IMAGE_HEIGHT = 10
    SEQ_LENGTH = 1000
    SEQ_OVERLAP = 50
    TOTAL_LABELS = 5               # * A C G T
    HIDDEN_SIZE = 128
    MAX_READS_IN_REGION = 1500
    LABEL_DECODER = {0: '', 1: 'A', 2: 'C', 3: 'G', 4: 'T'}


class ReadFilterOptions:
    MIN_MAPQ = 5
    MIN_BASEQ = 1
    INCLUDE_SUPPLEMENTARY = False


class TruthFilterOptions:
    MIN_MAPQ = 60
    MIN_BASEQ = 0
    INCLUDE_SUPPLEMENTARY = True


class TrainOptions:
    TRAIN_WINDOW = 100
    WINDOW_JUMP = 50
    GRU_LAYERS = 1
    HIDDEN_SIZE = 256


class AlignerOptions:
    REGION_SAFE_BASES = 100        # halo fetched around each region
    MAX_READS_IN_REGION = 5000
    RANDOM_SEED = 2719747673       # reservoir-sampling seed (Options.py:99)


class CandidateFinderOptions:
    """Decode-time constants (reference Options.py:44-80)."""

    MOST_ALLOWED_CANDIDATES_PER_SITE = 2
    SAFE_BASES = 20
    ALT_PROB_THRESHOLD = 0.1


# Variant types (region_summary.h VariantTypes / candidate_finder.h AlleleType)
HOM_REF = 0
SNP = 1
INSERT = 2
DELETE = 3

# Candidate strings are "<type digit><seq>" with digits '1'/'2'/'3'
SNP_ALLELE = 1
INSERT_ALLELE = 2
DELETE_ALLELE = 3

# Candidate strings longer than this encode >=50bp events (SVs) and are dropped
# (region_summary.cpp:461,511).
MAX_CANDIDATE_STRING_LEN = 61


@dataclass
class PepperOptions:
    """Runtime options for the pipeline; resolved by presets.apply_preset.

    Field names intentionally mirror the reference's argparse destinations
    (pepper_variant/modules/argparse/*.py) so documentation and presets
    translate 1:1.
    """

    # I/O
    bam: str = ""
    fasta: str = ""
    output_dir: str = ""
    model_path: str = ""
    sample_name: str = "Sample"
    threads: int = 1
    region: str | None = None
    region_size: int = 100000
    region_bed: str | None = None
    sub_command: str = "call_variant"

    # image generation thresholds
    min_mapq: int | None = None
    min_snp_baseq: int | None = None
    min_indel_baseq: int | None = None
    snp_frequency: float | None = None
    insert_frequency: float | None = None
    delete_frequency: float | None = None
    min_coverage_threshold: float | None = None
    candidate_support_threshold: float | None = None
    snp_candidate_frequency_threshold: float | None = None
    indel_candidate_frequency_threshold: float | None = None
    skip_indels: bool = False
    downsample_rate: float = 1.0
    include_supplementary: bool = False
    use_hp_info: bool = False

    # polish mode
    realignment: bool = True

    # inference (4096 amortizes per-dispatch cost best on measured TPU
    # serving — PERFORMANCE.md batch sweep; partial batches bucket-pad)
    batch_size: int = 4096
    num_workers: int = 0
    dry: bool = False
    # library default float32 (bit-stable tests); the CLI's argparse
    # default (bfloat16, cli/main.py) overrides it for production serving
    compute_dtype: str = "float32"
    quantized: bool = False
    # "static": exact-1/127 activation scales + int8 fused kernels (default);
    # "dynamic": per-batch absmax activation quantization (the reference's
    # dynamic-QUInt8 analogue, predict_distributed_cpu.py:188-193)
    quantize_mode: str = "static"
    model_type: str = "lstm"   # window-classifier family (models/registry.py)
    # local chips to shard inference batches over (data parallel): 1 =
    # single chip (library default, bit-stable tests); -1/0 = all local
    # devices (the CLI's argparse default, cli/main.py) — the TPU role of
    # the reference's --callers_per_gpu fan-out (RunInference.py:24-84)
    num_devices: int = 1
    # fused device-window flow: ship native int8 region images to HBM and
    # gather/inject/classify windows in one dispatch (ops/device_windows.py)
    device_pileup: bool = False
    device_region_batch: int = 32

    # candidate finding
    allowed_multiallelics: int | None = None
    snp_p_value: float | None = None
    insert_p_value: float | None = None
    delete_p_value: float | None = None
    snp_p_value_in_lc: float | None = None
    insert_p_value_in_lc: float | None = None
    delete_p_value_in_lc: float | None = None
    snp_q_cutoff: float | None = None
    indel_q_cutoff: float | None = None
    snp_q_cutoff_in_lc: float | None = None
    indel_q_cutoff_in_lc: float | None = None
    report_snp_above_freq: float | None = None
    report_indel_above_freq: float | None = None
    freq_based: bool = False
    freq: float = 0.10

    # training
    train_mode: bool = False
    truth_vcf: str | None = None
    random_draw_probability: float = 0.33

    # platform preset flags
    ont_r9_guppy5_sup: bool = False
    ont_r9_guppy4_hac: bool = False
    ont_r10_q20: bool = False
    hifi: bool = False
    clr: bool = False
