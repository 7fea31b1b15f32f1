"""Decode-path branch coverage: multiallelic assembly, suffix
normalization, homopolymer thresholds, QV routing, VAF overrides and
variant merging — driven with synthetic predictions (model bypassed)."""

import gzip
import os

import numpy as np
import pytest

from pepper_tpu.decode.candidate_finder import (
    CandidatePrediction, decode_predictions, find_candidates,
    repeat_annotation)
from pepper_tpu.decode.vcf_writer import VCFWriter
from pepper_tpu.io.bam_writer import write_fasta
from pepper_tpu.io.fasta import FastaReader
from pepper_tpu.options import PepperOptions
from pepper_tpu.presets import set_parameters


@pytest.fixture
def fasta(tmp_path):
    # non-repetitive sequence, with a homopolymer island at 200..208
    rng = np.random.RandomState(9)
    bases = []
    prev = ""
    for _ in range(400):
        choices = [b for b in "ACGT" if b != prev]
        prev = choices[rng.randint(3)]
        bases.append(prev)
    seq = "".join(bases)
    seq = seq[:200] + "AAAAAAAA" + seq[208:]
    path = str(tmp_path / "ref.fa")
    write_fasta(path, {"chr1": seq})
    return FastaReader(path), seq


def make_options(**overrides):
    options = PepperOptions(ont_r9_guppy5_sup=True,
                            sub_command="call_variant")
    options = set_parameters(options)
    for key, value in overrides.items():
        setattr(options, key, value)
    return options


def prediction(contig, pos, candidates, freqs, probs, depth=50):
    return CandidatePrediction(
        contig=contig, position=pos, depth=depth, candidates=candidates,
        candidate_frequency=freqs,
        prediction_base=np.asarray(probs, np.float64))


def run_pipeline(tmp_path, fasta_handler, predictions, options):
    margin, dv = decode_predictions(options, predictions, fasta_handler)
    contigs, margin_dict, dv_dict = find_candidates(margin, dv)
    out = str(tmp_path / "vcfs")
    os.makedirs(out, exist_ok=True)
    writer = VCFWriter(contigs, fasta_handler, "S", out, "FULL", "PEPPER",
                       "VC")
    totals = writer.write_vcf_records(dv_dict, options)
    writer.close()
    records = []
    with gzip.open(os.path.join(out, "FULL.vcf.gz"), "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            fields = line.rstrip().split("\t")
            sample = dict(zip(fields[8].split(":"), fields[9].split(":")))
            records.append(dict(pos=int(fields[1]) - 1, ref=fields[3],
                                alts=fields[4].split(","),
                                qual=int(fields[5]), filter=fields[6],
                                sample=sample))
    return totals, records, out


def test_repeat_annotation_homopolymer():
    assert max(repeat_annotation("AAAAA", 1)) == 5
    assert max(repeat_annotation("ACGTACGT", 1)) == 1
    # kmer=2 repeats
    assert max(repeat_annotation("ACACACAC", 2)) == 4


def test_multiallelic_het_alt_site(tmp_path, fasta):
    fasta_handler, seq = fasta
    pos = 100
    # two SNP alleles, both het (prediction says het) -> GT 1/2
    predictions = [
        prediction("chr1", pos, ["1" + a], [20], [0.02, 0.95, 0.03])
        for a in ("A", "C") if a != seq[pos]
    ][:2]
    options = make_options()
    totals, records, _ = run_pipeline(tmp_path, fasta_handler, predictions,
                                      options)
    assert len(records) == 1
    record = records[0]
    assert len(record["alts"]) == 2
    assert record["sample"]["GT"] == "1/2"
    assert record["filter"] == "PASS"


def test_snp_plus_deletion_suffix_normalization(tmp_path, fasta):
    fasta_handler, seq = fasta
    pos = 120
    ref_base = seq[pos]
    alt_base = {"A": "T", "T": "A", "C": "G", "G": "C"}[ref_base]
    deleted = seq[pos:pos + 3]
    predictions = [
        prediction("chr1", pos, ["1" + alt_base], [25], [0.01, 0.97, 0.02]),
        prediction("chr1", pos, ["3" + deleted], [20], [0.01, 0.96, 0.03]),
    ]
    options = make_options()
    totals, records, _ = run_pipeline(tmp_path, fasta_handler, predictions,
                                      options)
    assert len(records) == 1
    record = records[0]
    # site ref is the longest ref allele (the deletion's)
    assert record["ref"] == deleted
    # the SNP alt is suffix-extended with the deleted ref tail
    assert alt_base + deleted[1:] in record["alts"]
    assert ref_base in record["alts"]          # deletion alt
    assert record["sample"]["GT"] == "1/2"


def test_refcall_routed_to_regenotyping(tmp_path, fasta):
    fasta_handler, seq = fasta
    pos = 140
    alt_base = {"A": "T", "T": "A", "C": "G", "G": "C"}[seq[pos]]
    # model says hom-ref but the site passes p-value gates (non_alt=0.3)
    predictions = [prediction("chr1", pos, ["1" + alt_base], [10],
                              [0.70, 0.30, 0.00])]
    options = make_options()
    totals, records, out = run_pipeline(tmp_path, fasta_handler,
                                        predictions, options)
    assert records[0]["filter"] == "refCall"
    assert records[0]["sample"]["GT"] == "0/0"
    assert totals[2] == 1      # selected for re-genotyping
    assert totals[1] == 0      # not a confident PEPPER call
    with gzip.open(os.path.join(out, "VC_SNPs.vcf.gz"), "rt") as f:
        snp_lines = [l for l in f if not l.startswith("#")]
    assert len(snp_lines) == 1


def test_low_qual_het_routed_to_regenotyping(tmp_path, fasta):
    fasta_handler, seq = fasta
    pos = 160
    alt_base = {"A": "T", "T": "A", "C": "G", "G": "C"}[seq[pos]]
    # het with p=0.90 -> qual = -10log10(0.1) = 10 <= snp_q_cutoff 20
    predictions = [prediction("chr1", pos, ["1" + alt_base], [25],
                              [0.05, 0.90, 0.05])]
    options = make_options()
    totals, records, _ = run_pipeline(tmp_path, fasta_handler, predictions,
                                      options)
    assert records[0]["filter"] == "PASS"
    assert records[0]["qual"] == 10
    assert totals[2] == 1 and totals[1] == 0


def test_homopolymer_site_uses_lc_thresholds(tmp_path, fasta):
    fasta_handler, seq = fasta
    pos = 203  # inside the AAAAAAAA island
    assert seq[pos] == "A"
    predictions = [prediction("chr1", pos, ["2AT"], [20],
                              [0.05, 0.90, 0.05])]
    # insert_p_value very high, lc p-value low: only the lc gate passes
    options = make_options(insert_p_value=0.99, insert_p_value_in_lc=0.5)
    totals, records, _ = run_pipeline(tmp_path, fasta_handler, predictions,
                                      options)
    assert len(records) == 1
    assert records[0]["sample"]["REP"] == "1"

    # at a non-repeat site the same gates reject the candidate
    pos2 = 260
    predictions = [prediction("chr1", pos2, ["2" + seq[pos2] + "T"], [20],
                              [0.05, 0.90, 0.05])]
    totals2, records2, _ = run_pipeline(tmp_path, fasta_handler,
                                        predictions, options)
    assert records2 == []


def test_report_snp_above_freq_override(tmp_path, fasta):
    fasta_handler, seq = fasta
    pos = 180
    alt_base = {"A": "T", "T": "A", "C": "G", "G": "C"}[seq[pos]]
    # non_alt prediction below p-value, but VAF 0.5 >= report threshold
    predictions = [prediction("chr1", pos, ["1" + alt_base], [25],
                              [0.99, 0.01, 0.00])]
    options = make_options(snp_p_value=0.5, report_snp_above_freq=0.3)
    totals, records, _ = run_pipeline(tmp_path, fasta_handler, predictions,
                                      options)
    assert len(records) == 1

    options2 = make_options(snp_p_value=0.5, report_snp_above_freq=0.9)
    totals2, records2, _ = run_pipeline(tmp_path, fasta_handler,
                                        predictions, options2)
    assert records2 == []


def test_merge_variants(tmp_path, fasta):
    fasta_handler, seq = fasta
    pos_pepper_only = 100
    pos_overridden = 140
    alt1 = {"A": "T", "T": "A", "C": "G", "G": "C"}[seq[pos_pepper_only]]
    alt2 = {"A": "T", "T": "A", "C": "G", "G": "C"}[seq[pos_overridden]]
    predictions = [
        prediction("chr1", pos_pepper_only, ["1" + alt1], [25],
                   [0.01, 0.98, 0.01]),
        prediction("chr1", pos_overridden, ["1" + alt2], [25],
                   [0.01, 0.98, 0.01]),
    ]
    options = make_options()
    totals, records, out = run_pipeline(tmp_path, fasta_handler,
                                        predictions, options)
    pepper_vcf = os.path.join(out, "FULL.vcf.gz")

    # fake DeepVariant output overriding pos_overridden
    dv_path = str(tmp_path / "dv.vcf")
    with open(dv_path, "w") as f:
        f.write("##fileformat=VCFv4.2\n"
                f"##contig=<ID=chr1,length={len(seq)}>\n"
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
                f"chr1\t{pos_overridden + 1}\t.\t{seq[pos_overridden]}\t"
                f"{alt2}\t55\tPASS\t.\tGT:GQ:DP:AD:VAF\t"
                "1/1:55:40:5,35:0.875\n")

    class MergeOptions:
        vcf_pepper = pepper_vcf
        vcf_deepvariant = dv_path
        vcf_deepvariant_snps = None
        vcf_deepvariant_indels = None
        output_dir = str(tmp_path / "merged")

    from pepper_tpu.decode.merge_variants import merge_vcf_records

    merged_path = merge_vcf_records(MergeOptions())
    with gzip.open(merged_path, "rt") as f:
        merged = [line.rstrip().split("\t") for line in f
                  if not line.startswith("#")]
    by_pos = {int(r[1]) - 1: r for r in merged}
    assert by_pos[pos_pepper_only][9].endswith(":P")
    assert by_pos[pos_overridden][9].endswith(":DV")
    assert by_pos[pos_overridden][5] == "55"


def test_bulk_contexts_match_per_candidate_fetch(fasta):
    """_contexts_bulk (tiled, order-preserving) must return exactly the
    strings of per-candidate _candidate_context calls, in input order —
    including shuffled input and contig-edge positions."""
    from pepper_tpu.decode import candidate_finder as cf

    handler, seq = fasta
    rng = np.random.RandomState(4)
    positions = list(rng.randint(0, len(seq), size=200))
    positions += [0, 1, 5, len(seq) - 1, len(seq) - 5]  # edges
    rng.shuffle(positions)
    probs = np.array([0.2, 0.7, 0.1])
    candidates = [CandidatePrediction("chr1", int(p), 30, ["1A"], [9], probs)
                  for p in positions]
    bulk = cf._contexts_bulk(handler, candidates)
    single = [cf._candidate_context(handler, "chr1", int(p))
              for p in positions]
    assert bulk == single


def test_bulk_contexts_small_tile(fasta, monkeypatch):
    """Force tiny tiles so the tile-advance path is exercised."""
    from pepper_tpu.decode import candidate_finder as cf

    handler, seq = fasta
    monkeypatch.setattr(cf, "_CONTEXT_TILE", 64)
    positions = list(range(0, len(seq), 7))
    candidates = [CandidatePrediction("chr1", p, 30, ["1A"], [9],
                                      np.array([0.2, 0.7, 0.1]))
                  for p in positions]
    bulk = cf._contexts_bulk(handler, candidates)
    single = [cf._candidate_context(handler, "chr1", p) for p in positions]
    assert bulk == single


def _normalize(candidate_list):
    return [tuple(np.asarray(x).tolist() if isinstance(x, np.ndarray)
                  else x for x in cand) for cand in candidate_list]


def test_parallel_decode_matches_sequential(fasta, tmp_path):
    """decode_predictions_parallel is bit-identical to the sequential
    decode: chunks concatenate in submission order, so the stream the
    stable sort in find_candidates sees is unchanged."""
    from pepper_tpu.decode.candidate_finder import (
        decode_predictions_parallel)

    handler, seq = fasta
    fasta_path = str(tmp_path / "ref.fa")  # where the fixture wrote it
    options = make_options()
    rng = np.random.RandomState(11)
    predictions = []
    for i in range(300):
        pos = int(rng.randint(5, len(seq) - 5))
        kind = ("1", "2", "3")[i % 3]
        allele = ("A", "AC", seq[pos:pos + 2])[i % 3]
        probs = rng.dirichlet(np.ones(3))
        predictions.append(prediction(
            "chr1", pos, [f"{kind}{allele}"], [int(rng.randint(3, 30))],
            probs, depth=40))
        if i % 7 == 0:  # multiallelic + invalid-allele branches
            predictions[-1].candidates.append("1N")
            predictions[-1].candidate_frequency.append(5)

    sequential = decode_predictions(options, predictions, handler)
    parallel = decode_predictions_parallel(options, predictions, fasta_path,
                                           threads=4, chunk_size=32)
    assert _normalize(parallel[0]) == _normalize(sequential[0])
    assert _normalize(parallel[1]) == _normalize(sequential[1])


# ---- parallel VCF emission ----

def _read_bgzf_blocks(path):
    """coffset -> decompressed block bytes."""
    import struct
    import zlib

    with open(path, "rb") as f:
        data = f.read()
    blocks = {}
    offset = 0
    while offset < len(data):
        xlen = struct.unpack_from("<H", data, offset + 10)[0]
        bsize = struct.unpack_from("<H", data, offset + 16)[0] + 1
        cdata = data[offset + 12 + xlen:offset + bsize - 8]
        blocks[offset] = zlib.decompress(cdata, -15)
        offset += bsize
    return blocks


def _parse_tbi_chunk_starts(path):
    """All chunk-begin virtual offsets from a .tbi index."""
    import struct

    blocks = _read_bgzf_blocks(path)
    raw = b"".join(blocks[k] for k in sorted(blocks))
    assert raw[:4] == b"TBI\x01"
    n_ref = struct.unpack_from("<i", raw, 4)[0]
    l_nm = struct.unpack_from("<i", raw, 32)[0]
    offset = 36 + l_nm
    starts = []
    for _ in range(n_ref):
        n_bin = struct.unpack_from("<i", raw, offset)[0]
        offset += 4
        for _ in range(n_bin):
            n_chunk = struct.unpack_from("<i", raw, offset + 4)[0]
            offset += 8
            for _ in range(n_chunk):
                u, _v = struct.unpack_from("<QQ", raw, offset)
                starts.append(u)
                offset += 16
        n_intv = struct.unpack_from("<i", raw, offset)[0]
        offset += 4 + 8 * n_intv
    return starts


@pytest.mark.parametrize("engine", ["native", "python"])
def test_parallel_vcf_emission_matches_sequential(fasta, tmp_path,
                                                  monkeypatch, engine):
    """write_vcf_records_parallel: identical decompressed contents + totals
    vs the sequential writer across all 5 files, multi-contig, with valid
    rebased tabix offsets (every chunk start lands on a record start).

    Parameterized over both engines: the native `_pepper_vcfemit` path
    short-circuits before the pool, so PEPPER_PY_VCF=1 is required to
    exercise the pure-Python pool branch (_emit_compress_worker, flush
    ordering, voffset rebase) in CI."""
    import concurrent.futures

    from pepper_tpu.io.bam_writer import write_fasta

    if engine == "python":
        monkeypatch.setenv("PEPPER_PY_VCF", "1")

    rng = np.random.RandomState(21)
    seqs = {}
    prev = ""
    for contig in ("chr1", "chr2", "chr3"):
        bases = []
        for _ in range(3000):
            choices = [b for b in "ACGT" if b != prev]
            prev = choices[rng.randint(3)]
            bases.append(prev)
        seqs[contig] = "".join(bases)
    ref_path = str(tmp_path / "multi.fa")
    write_fasta(ref_path, seqs)
    handler = FastaReader(ref_path)

    options = make_options()
    predictions = []
    for contig, seq in seqs.items():
        # overlapping position sets across contigs exercise the
        # cross-contig last_position quirk
        for pos in range(10, 2900, 7):
            kind = ("1", "2", "3")[pos % 3]
            allele = ("A", "AC", seq[pos:pos + 2])[pos % 3]
            probs = rng.dirichlet(np.ones(3) * 0.5)
            predictions.append(prediction(
                contig, pos, [f"{kind}{allele}"],
                [int(rng.randint(3, 30))], probs, depth=40))
    margin, dv = decode_predictions(options, predictions, handler)
    contigs, _margin_dict, dv_dict = find_candidates(margin, dv)
    assert len(dv_dict) > 300

    out_seq = str(tmp_path / "seq")
    out_par = str(tmp_path / "par")
    os.makedirs(out_seq), os.makedirs(out_par)
    writer = VCFWriter(contigs, handler, "S", out_seq, "FULL", "PEPPER",
                       "VC")
    totals_seq = writer.write_vcf_records(dv_dict, options)
    writer.close()

    writer = VCFWriter(contigs, handler, "S", out_par, "FULL", "PEPPER",
                       "VC")
    with concurrent.futures.ProcessPoolExecutor(max_workers=3) as pool:
        totals_par = writer.write_vcf_records_parallel(
            dv_dict, options, pool, threads=3, chunk=64)
    writer.close()

    assert totals_par == totals_seq
    names = ("FULL", "PEPPER", "VC", "VC_SNPs", "VC_INDEL")
    for name in names:
        with gzip.open(os.path.join(out_seq, name + ".vcf.gz"), "rb") as f:
            expected = f.read()
        with gzip.open(os.path.join(out_par, name + ".vcf.gz"), "rb") as f:
            got = f.read()
        assert got == expected, name

    # tabix validity on the parallel files: every chunk-begin virtual
    # offset must decode to the start of a record line
    contig_prefixes = tuple(c.encode() + b"\t" for c in seqs)
    for name in names:
        path = os.path.join(out_par, name + ".vcf.gz")
        blocks = _read_bgzf_blocks(path)
        for voff in _parse_tbi_chunk_starts(path + ".tbi"):
            coffset, intra = voff >> 16, voff & 0xffff
            assert coffset in blocks
            snippet = blocks[coffset][intra:intra + 8]
            assert snippet.startswith(contig_prefixes), (name, voff)


def test_parallel_vcf_emission_small_fallback(fasta, tmp_path):
    """Below the chunk threshold the parallel entry point must defer to the
    sequential writer (no pool round-trips for tiny runs)."""
    handler, seq = fasta
    options = make_options()
    pos = 100
    alt = {"A": "T", "T": "A", "C": "G", "G": "C"}[seq[pos]]
    predictions = [prediction("chr1", pos, ["1" + alt], [25],
                              [0.01, 0.97, 0.02])]
    margin, dv = decode_predictions(options, predictions, handler)
    contigs, _m, dv_dict = find_candidates(margin, dv)
    out = str(tmp_path / "small")
    os.makedirs(out)
    writer = VCFWriter(contigs, handler, "S", out, "FULL", "PEPPER", "VC")
    totals = writer.write_vcf_records_parallel(dv_dict, options, None, 8)
    writer.close()
    assert totals[0] == 1


def test_fast_single_candidate_encode_matches_general(fasta):
    """_encode_single_candidate must equal encode_vcf_record([c]) exactly
    (line bytes, span, route) over fuzzed probabilities/types/repeats."""
    from pepper_tpu.decode.vcf_writer import (_encode_single_candidate,
                                              encode_vcf_record)

    options = make_options()
    rng = np.random.RandomState(33)
    for i in range(4000):
        pos = int(rng.randint(0, 1 << 30))
        ref_allele, alt = (("A", "T"), ("A", "ACC"), ("ACCG", "A"),
                           ("C", "CTTTTT"))[i % 4]
        probs = rng.dirichlet(np.ones(3) * 0.4)
        n_ap = int(rng.randint(1, 4))
        candidate = ("chr1", pos, pos + len(ref_allele), ref_allele,
                     [alt], [0, 1], int(rng.randint(1, 80)),
                     [int(rng.randint(0, 60))], float(probs.max()), probs,
                     [float(rng.rand()) for _ in range(n_ap)],
                     bool(i % 3 == 0))
        fast = _encode_single_candidate(candidate, options)
        general = encode_vcf_record([candidate], options)
        assert fast == general, i


def test_native_vcf_emit_matches_python(fasta, tmp_path, monkeypatch):
    """The _pepper_vcfemit extension must produce byte-identical .vcf.gz
    and .tbi files to the pure-Python engine (same chunking + deflate
    parameters), across single/multi-candidate sites, an empty group
    (None record), and a cross-contig equal-position dedup."""
    from pepper_tpu.decode import vcf_writer as vw
    from pepper_tpu.io.bam_writer import write_fasta

    if vw._get_native_emit() is None:
        pytest.skip("native vcf emit unavailable")

    rng = np.random.RandomState(5)
    seqs = {"chr1": "".join("ACGT"[i] for i in rng.randint(0, 4, 4000)),
            "chr2": "".join("ACGT"[i] for i in rng.randint(0, 4, 4000)),
            "chr3": "".join("ACGT"[i] for i in rng.randint(0, 4, 4000))}
    ref_path = str(tmp_path / "two.fa")
    write_fasta(ref_path, seqs)
    handler = FastaReader(ref_path)
    options = make_options()

    def candidate(contig, pos, kind, p, n_ap=1, depth=40, support=20):
        ref_allele, alt = (("A", "T"), ("A", "ACC"), ("ACCG", "A"))[kind]
        return (contig, pos, pos + len(ref_allele), ref_allele, [alt],
                [0, 1], depth, [support], float(np.max(p)), np.asarray(p),
                [float(x) for x in rng.rand(n_ap)], bool(pos % 3 == 0))

    dv_dict = {}
    for contig in ("chr1", "chr2"):
        for pos in range(10, 3900, 5):
            p = rng.dirichlet(np.ones(3) * 0.5)
            group = [candidate(contig, pos, pos % 3, p,
                               n_ap=1 + pos % 3)]
            if pos % 11 == 0:  # multi-candidate site -> general path
                q = rng.dirichlet(np.ones(3) * 0.5)
                group.append(candidate(contig, pos, (pos + 1) % 3, q,
                                       support=9))
            dv_dict[(contig, pos)] = group
    # chr3's only site sits at chr2's last emitted position — the
    # cross-contig `last_position` dedup must drop it (VcfWriter.py:149)
    dv_dict[("chr3", 3895)] = [candidate(
        "chr3", 3895, 0, rng.dirichlet(np.ones(3)))]
    dv_dict[("chr1", 777)] = []  # empty group -> None record path

    outputs = {}
    for engine in ("native", "python"):
        if engine == "python":
            monkeypatch.setenv("PEPPER_PY_VCF", "1")
        out = str(tmp_path / engine)
        os.makedirs(out)
        writer = VCFWriter(list(seqs), handler, "S", out, "FULL", "PEPPER",
                           "VC")
        totals = writer.write_vcf_records_parallel(dv_dict, options, None,
                                                   2, chunk=64)
        writer.close()
        outputs[engine] = (totals, out)
        monkeypatch.delenv("PEPPER_PY_VCF", raising=False)

    assert outputs["native"][0] == outputs["python"][0]
    assert outputs["native"][0][0] > 1000
    # decompressed contents must be byte-identical; compressed bytes may
    # differ only in block boundaries (the engines chunk on items vs
    # emitted records), so tabix validity is checked semantically
    contig_prefixes = tuple(c.encode() + b"\t" for c in seqs)
    for name in ("FULL", "PEPPER", "VC", "VC_SNPs", "VC_INDEL"):
        with gzip.open(os.path.join(outputs["native"][1],
                                    name + ".vcf.gz"), "rb") as f:
            native_content = f.read()
        with gzip.open(os.path.join(outputs["python"][1],
                                    name + ".vcf.gz"), "rb") as f:
            python_content = f.read()
        assert native_content == python_content, name
        assert b"\nchr3\t" not in native_content  # cross-contig dedup
        path = os.path.join(outputs["native"][1], name + ".vcf.gz")
        blocks = _read_bgzf_blocks(path)
        for voff in _parse_tbi_chunk_starts(path + ".tbi"):
            coffset, intra = voff >> 16, voff & 0xffff
            snippet = blocks[coffset][intra:intra + 8]
            assert snippet.startswith(contig_prefixes), (name, voff)


def test_annotate_bulk_matches_per_candidate(tmp_path):
    """_annotate_bulk must equal per-candidate candidate_in_homopolymer +
    _candidate_context ref_base — including long runs crossing the +-10bp
    window edge (the reference truncates runs at the fetch), N runs,
    contig boundaries, and shuffled multi-contig input."""
    from pepper_tpu.decode import candidate_finder as cf
    from pepper_tpu.io.bam_writer import write_fasta

    rng = np.random.RandomState(8)
    pieces = []
    while sum(len(p) for p in pieces) < 6000:
        r = rng.rand()
        if r < 0.4:  # homopolymer run, lengths straddling the threshold
            pieces.append("ACGTN"[rng.randint(5)] * rng.randint(3, 30))
        else:
            pieces.append("".join("ACGT"[i]
                                  for i in rng.randint(0, 4, 20)))
    seq1 = "".join(pieces)
    seq2 = "".join("ACGT"[i] for i in rng.randint(0, 4, 500)) + "A" * 40
    path = str(tmp_path / "hp.fa")
    write_fasta(path, {"c1": seq1, "c2": seq2})
    handler = FastaReader(path)

    candidates = []
    for contig, seq in (("c1", seq1), ("c2", seq2)):
        positions = list(rng.randint(0, len(seq), 400))
        positions += [0, 1, 4, 5, 9, 10, len(seq) - 1, len(seq) - 5,
                      len(seq) - 11]
        for pos in positions:
            candidates.append(CandidatePrediction(
                contig, int(pos), 30, ["1A"], [9],
                np.array([0.2, 0.7, 0.1])))
    rng.shuffle(candidates)

    in_repeat, ref_codes = cf._annotate_bulk(handler, candidates)
    for i, candidate in enumerate(candidates):
        expected_repeat = cf.candidate_in_homopolymer(
            handler, candidate.contig, candidate.position)
        expected_base, _, _ = cf._candidate_context(
            handler, candidate.contig, candidate.position)
        assert bool(in_repeat[i]) == expected_repeat, \
            (candidate.contig, candidate.position)
        base = chr(ref_codes[i]) if ref_codes[i] else ""
        assert base == expected_base, \
            (candidate.contig, candidate.position)


def test_annotate_bulk_small_tiles(tmp_path, monkeypatch):
    """Tile advances mid-stream must not change results."""
    from pepper_tpu.decode import candidate_finder as cf
    from pepper_tpu.io.bam_writer import write_fasta

    rng = np.random.RandomState(18)
    seq = ("".join("ACGT"[i] for i in rng.randint(0, 4, 300))
           + "G" * 12
           + "".join("ACGT"[i] for i in rng.randint(0, 4, 300)))
    path = str(tmp_path / "tiles.fa")
    write_fasta(path, {"c1": seq})
    handler = FastaReader(path)
    monkeypatch.setattr(cf, "_CONTEXT_TILE", 64)
    candidates = [CandidatePrediction("c1", p, 30, ["1A"], [9],
                                      np.array([0.2, 0.7, 0.1]))
                  for p in range(0, len(seq), 3)]
    in_repeat, ref_codes = cf._annotate_bulk(handler, candidates)
    for i, candidate in enumerate(candidates):
        assert bool(in_repeat[i]) == cf.candidate_in_homopolymer(
            handler, "c1", candidate.position), candidate.position
        base = chr(ref_codes[i]) if ref_codes[i] else ""
        assert base == seq[candidate.position:candidate.position + 1]


def test_native_vcf_emit_rejects_malformed_items():
    """A wrong-arity tuple must raise TypeError (was a segfault)."""
    from pepper_tpu.decode.vcf_writer import _get_native_emit

    emit = _get_native_emit()
    if emit is None:
        pytest.skip("native vcf emit unavailable")
    with pytest.raises(TypeError):
        emit([("chr1", 100, "A")], (10.0, 10.0, 10.0, 10.0), -1, 1)
    with pytest.raises(TypeError):
        emit(["not-a-tuple"], (10.0, 10.0, 10.0, 10.0), -1, 1)
    # a 5-tuple route outside [0, 2] must raise ValueError (was an OOB
    # counts[] write)
    for route in (-1, 3, 7):
        with pytest.raises(ValueError):
            emit([("chr1", 100, 101, b"chr1\t101\t.\tA\tT\t9\tPASS\t.\n",
                   route)], (10.0, 10.0, 10.0, 10.0), -1, 1)


def test_native_decode_matches_python_engine(tmp_path):
    """The _pepper_decode gate pass (default) and the pure-Python engine
    must produce identical margin/DV lists — fuzz over random alleles
    (incl. invalid chars, empty bodies, unknown types), mixed prob
    dtypes, VAF overrides and the delete reference-swap chain."""
    from pepper_tpu.decode import candidate_finder as cf
    from pepper_tpu.io.bam_writer import write_fasta
    from pepper_tpu.options import PepperOptions
    from pepper_tpu.presets import set_parameters

    if cf._native_decode_module() is None:
        pytest.skip("native decode extension unavailable")

    rng = np.random.RandomState(4)
    pieces = []
    while sum(len(p) for p in pieces) < 50_000:
        if rng.rand() < 0.3:
            pieces.append("ACGTN"[rng.randint(5)] * rng.randint(3, 25))
        else:
            pieces.append("".join("ACGT"[i]
                                  for i in rng.randint(0, 4, 30)))
    seq = "".join(pieces)
    path = str(tmp_path / "fz.fa")
    write_fasta(path, {"cF": seq})
    fasta = FastaReader(path)

    def rand_allele():
        t = str(rng.choice(["1", "2", "3", "7"]))
        body = "".join(rng.choice(list("ACGTNacgt"),
                                  rng.randint(0, 8)))
        if rng.rand() < 0.05:
            body += "x"
        return t + body

    preds = []
    for i in range(3000):
        k = rng.randint(1, 5)
        probs = rng.dirichlet([1, 1, 1]).astype(
            np.float32 if i % 2 else np.float64)
        # depth 0 (fully filtered column) must gate identically in both
        # engines (VAF treated as 0, no division); int-typed prob buffers
        # must route through the sequence fallback, not raw reinterpret
        depth = 0 if i % 37 == 0 else int(rng.randint(1, 60))
        if i % 53 == 0:
            probs = (probs * 1000).astype(
                np.int64 if i % 2 else np.int32)
        preds.append(CandidatePrediction(
            contig="cF", position=int(rng.randint(0, len(seq))),
            depth=depth,
            candidates=[rand_allele() for _ in range(k)],
            candidate_frequency=[int(rng.randint(1, 50))
                                 for _ in range(k)],
            prediction_base=probs))

    for overrides in ({}, dict(report_snp_above_freq=0.1,
                               report_indel_above_freq=0.15),
                      dict(snp_p_value=0.9, insert_p_value=0.9,
                           delete_p_value=0.9,
                           report_indel_above_freq=0.2)):
        options = set_parameters(PepperOptions(
            sub_command="call_variant", ont_r9_guppy5_sup=True))
        for key, value in overrides.items():
            setattr(options, key, value)
        m_native, d_native = cf.decode_predictions(options, preds, fasta)
        m_python, d_python = cf._decode_predictions_py(options, preds,
                                                       fasta)
        assert len(m_native) == len(m_python)
        assert len(d_native) == len(d_python)
        for a, b in zip(m_native + d_native, m_python + d_python):
            assert len(a) == len(b)
            for j, (x, y) in enumerate(zip(a, b)):
                if j == 9:  # prediction_base: original vs float64 cast
                    assert [float(v) for v in x] == [float(v) for v in y]
                else:
                    assert x == y, (j, x, y)
