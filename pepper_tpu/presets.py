"""Per-platform parameter presets.

Fills unset fields of PepperOptions exactly as the reference's
pepper_variant/modules/argparse/SetParameters.py:5-283 does; the resolved
threshold table is logged at startup (the reference treats that log as its
config audit trail, SetParameters.py:291-318).
"""

import sys
from datetime import datetime

from .options import PepperOptions

_IMAGE_CMDS = ("call_variant", "make_images", "make_train_images")
_FIND_CMDS = ("call_variant", "find_candidates")


def _log(msg: str) -> None:
    ts = datetime.now().strftime("%m-%d-%Y %H:%M:%S")
    sys.stderr.write(f"[{ts}] INFO: {msg}\n")


# (image-generation defaults, candidate-finding defaults) keyed by preset flag.
_PRESETS = {
    "ont_r9_guppy5_sup": (
        dict(min_mapq=5, min_snp_baseq=1, min_indel_baseq=1, snp_frequency=0.10,
             insert_frequency=0.15, delete_frequency=0.15, min_coverage_threshold=3,
             candidate_support_threshold=2, snp_candidate_frequency_threshold=0.10,
             indel_candidate_frequency_threshold=0.10, skip_indels=False),
        dict(allowed_multiallelics=4, snp_p_value=0.1, insert_p_value=0.1,
             delete_p_value=0.1, snp_q_cutoff=20, indel_q_cutoff=15,
             report_snp_above_freq=0, report_indel_above_freq=0,
             snp_p_value_in_lc=0.1, insert_p_value_in_lc=0.15,
             delete_p_value_in_lc=0.1, snp_q_cutoff_in_lc=20,
             indel_q_cutoff_in_lc=10),
    ),
    "ont_r9_guppy4_hac": (
        dict(min_mapq=5, min_snp_baseq=1, min_indel_baseq=1, snp_frequency=0.10,
             insert_frequency=0.12, delete_frequency=0.12, min_coverage_threshold=3,
             candidate_support_threshold=2, snp_candidate_frequency_threshold=0.10,
             indel_candidate_frequency_threshold=0.10, skip_indels=False),
        dict(allowed_multiallelics=4, snp_p_value=0.10, insert_p_value=0.25,
             delete_p_value=0.25, snp_q_cutoff=20, indel_q_cutoff=15,
             report_snp_above_freq=0, report_indel_above_freq=0,
             snp_p_value_in_lc=0.05, insert_p_value_in_lc=0.01,
             delete_p_value_in_lc=0.01, snp_q_cutoff_in_lc=20,
             indel_q_cutoff_in_lc=10),
    ),
    "ont_r10_q20": (
        dict(min_mapq=1, min_snp_baseq=1, min_indel_baseq=1, snp_frequency=0.1,
             insert_frequency=0.1, delete_frequency=0.1, min_coverage_threshold=3,
             candidate_support_threshold=2, snp_candidate_frequency_threshold=0.10,
             indel_candidate_frequency_threshold=0.10, skip_indels=False),
        dict(allowed_multiallelics=4, snp_p_value=0.00001, insert_p_value=0.001,
             delete_p_value=0.001, snp_q_cutoff=15, indel_q_cutoff=30,
             report_snp_above_freq=0, report_indel_above_freq=0,
             snp_p_value_in_lc=0.000001, insert_p_value_in_lc=0.001,
             delete_p_value_in_lc=0.001, snp_q_cutoff_in_lc=20,
             indel_q_cutoff_in_lc=35),
    ),
    "hifi": (
        dict(min_mapq=5, min_snp_baseq=10, min_indel_baseq=10, snp_frequency=0.10,
             insert_frequency=0.12, delete_frequency=0.10, min_coverage_threshold=2,
             candidate_support_threshold=2, snp_candidate_frequency_threshold=0.10,
             indel_candidate_frequency_threshold=0.10, skip_indels=False),
        dict(allowed_multiallelics=4, snp_p_value=0, insert_p_value=0,
             delete_p_value=0, snp_q_cutoff=15, indel_q_cutoff=20,
             report_snp_above_freq=0, report_indel_above_freq=0,
             snp_p_value_in_lc=0, insert_p_value_in_lc=0, delete_p_value_in_lc=0,
             snp_q_cutoff_in_lc=15, indel_q_cutoff_in_lc=20),
    ),
    "clr": (
        dict(min_mapq=5, min_snp_baseq=0, min_indel_baseq=0, snp_frequency=0.10,
             insert_frequency=0.12, delete_frequency=0.12, min_coverage_threshold=3,
             candidate_support_threshold=2, snp_candidate_frequency_threshold=0.10,
             indel_candidate_frequency_threshold=0.12, skip_indels=True),
        dict(allowed_multiallelics=4, snp_p_value=0.1, insert_p_value=0.2,
             delete_p_value=0.2, snp_q_cutoff=20, indel_q_cutoff=20,
             report_snp_above_freq=0, report_indel_above_freq=0,
             snp_p_value_in_lc=0.05, insert_p_value_in_lc=0.05,
             delete_p_value_in_lc=0.05, snp_q_cutoff_in_lc=20,
             indel_q_cutoff_in_lc=20),
    ),
}


def set_parameters(options: PepperOptions) -> PepperOptions:
    """Resolve platform presets into unset option fields and log the table."""
    active = [name for name in _PRESETS if getattr(options, name)]
    for name in active:
        mode = "HiFi" if name == "hifi" else ("CLR" if name == "clr" else "ONT")
        _log(f"{mode} VARIANT CALLING MODE SELECTED.")
        image_defaults, find_defaults = _PRESETS[name]
        if options.sub_command in _IMAGE_CMDS:
            for key, value in image_defaults.items():
                if key == "skip_indels":
                    # matches `if not options.skip_indels: options.skip_indels = value`
                    if not options.skip_indels:
                        options.skip_indels = value
                elif getattr(options, key) is None:
                    setattr(options, key, value)
        if options.sub_command in _FIND_CMDS:
            for key, value in find_defaults.items():
                if getattr(options, key) is None:
                    setattr(options, key, value)

    _log("MODE: PEPPER HP" if options.use_hp_info else "MODE: PEPPER")

    if options.sub_command in _IMAGE_CMDS:
        _log("THRESHOLDS ARE SET TO: ")
        _log(f"MIN MAPQ:\t\t\t\t{options.min_mapq}")
        _log(f"MIN SNP BASEQ:\t\t\t{options.min_snp_baseq}")
        _log(f"MIN INDEL BASEQ:\t\t\t{options.min_indel_baseq}")
        _log(f"MIN SNP FREQUENCY:\t\t\t{options.snp_frequency}")
        _log(f"MIN INSERT FREQUENCY:\t\t{options.insert_frequency}")
        _log(f"MIN DELETE FREQUENCY:\t\t{options.delete_frequency}")
        _log(f"MIN COVERAGE THRESHOLD:\t\t{options.min_coverage_threshold}")
        _log(f"MIN CANDIDATE SUPPORT:\t\t{options.candidate_support_threshold}")
        _log(f"MIN SNP CANDIDATE FREQUENCY:\t{options.snp_candidate_frequency_threshold}")
        _log(f"MIN INDEL CANDIDATE FREQUENCY:\t{options.indel_candidate_frequency_threshold}")
        _log(f"SKIP INDEL CANDIDATES:\t\t{options.skip_indels}")
    if options.sub_command in _FIND_CMDS:
        _log(f"MAX ALLOWED CANDIDATE IN ONE SITE:\t{options.allowed_multiallelics}")
        _log(f"MIN SNP PREDICTIVE VALUE:\t\t{options.snp_p_value}")
        _log(f"MIN INSERT PREDICTIVE VALUE:\t{options.insert_p_value}")
        _log(f"MIN DELETE PREDICTIVE VALUE:\t{options.delete_p_value}")
        _log(f"SNP QV CUTOFF FOR RE-GENOTYPING:\t{options.snp_q_cutoff}")
        _log(f"INDEL QV CUTOFF FOR RE-GENOTYPING:\t{options.indel_q_cutoff}")
        _log(f"REPORT ALL SNPs ABOVE THRESHOLD:\t{options.report_snp_above_freq}")
        _log(f"REPORT ALL INDELs ABOVE THRESHOLD:\t{options.report_indel_above_freq}")
        _log("LOW COMPLEXITY REGION SETUP:")
        _log(f"MIN SNP PREDICTIVE VALUE:\t\t{options.snp_p_value_in_lc}")
        _log(f"MIN INSERT PREDICTIVE VALUE:\t{options.insert_p_value_in_lc}")
        _log(f"MIN DELETE PREDICTIVE VALUE:\t{options.delete_p_value_in_lc}")
        _log(f"SNP QV CUTOFF FOR RE-GENOTYPING:\t{options.snp_q_cutoff_in_lc}")
        _log(f"INDEL QV CUTOFF FOR RE-GENOTYPING:\t{options.indel_q_cutoff_in_lc}")

    return options
