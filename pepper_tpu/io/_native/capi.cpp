// C ABI surface consumed by pepper_tpu.io.native via ctypes.
#include <cstring>
#include <string>

#include "bam.h"
#include "fasta.h"

extern "C" {

// ---------------- BAM ----------------

void* pepper_bam_open(const char* path) {
  auto* reader = new BamReader(path);
  if (!reader->ok()) {
    delete reader;
    return nullptr;
  }
  return reader;
}

void pepper_bam_close(void* handle) { delete static_cast<BamReader*>(handle); }

int pepper_bam_n_targets(void* handle) {
  return static_cast<int>(static_cast<BamReader*>(handle)->target_names().size());
}

const char* pepper_bam_target_name(void* handle, int i) {
  return static_cast<BamReader*>(handle)->target_names()[i].c_str();
}

long long pepper_bam_target_len(void* handle, int i) {
  return static_cast<BamReader*>(handle)->target_lens()[i];
}

void* pepper_bam_get_reads(void* handle, const char* chrom, long long start,
                           long long stop, int include_supplementary,
                           int min_mapq, int min_baseq) {
  auto batch = static_cast<BamReader*>(handle)->get_reads(
      chrom, start, stop, include_supplementary != 0, min_mapq, min_baseq);
  return batch.release();
}

void pepper_readbatch_free(void* batch) {
  delete static_cast<ReadBatch*>(batch);
}

long long pepper_rb_n_reads(void* batch) {
  return static_cast<long long>(static_cast<ReadBatch*>(batch)->n_reads());
}

#define RB_FIELD(name, type, member)                         \
  const type* pepper_rb_##name(void* batch) {                \
    return static_cast<ReadBatch*>(batch)->member.data();    \
  }

RB_FIELD(pos, int64_t, pos)
RB_FIELD(pos_end, int64_t, pos_end)
RB_FIELD(mapq, int32_t, mapq)
RB_FIELD(flag, int32_t, flag)
RB_FIELD(hp, int32_t, hp)
RB_FIELD(seq_offsets, int64_t, seq_offsets)
RB_FIELD(seq, char, seq)
RB_FIELD(qual, uint8_t, qual)
RB_FIELD(cigar_offsets, int64_t, cigar_offsets)
RB_FIELD(cigar_ops, uint8_t, cigar_ops)
RB_FIELD(cigar_lens, int32_t, cigar_lens)
RB_FIELD(name_offsets, int64_t, name_offsets)
RB_FIELD(names, char, names)

#undef RB_FIELD

long long pepper_rb_seq_size(void* batch) {
  return static_cast<long long>(static_cast<ReadBatch*>(batch)->seq.size());
}
long long pepper_rb_cigar_size(void* batch) {
  return static_cast<long long>(
      static_cast<ReadBatch*>(batch)->cigar_ops.size());
}
long long pepper_rb_names_size(void* batch) {
  return static_cast<long long>(static_cast<ReadBatch*>(batch)->names.size());
}

// ---------------- FASTA ----------------

void* pepper_fasta_open(const char* path) {
  auto* reader = new FastaReader(path);
  if (!reader->ok()) {
    delete reader;
    return nullptr;
  }
  return reader;
}

void pepper_fasta_close(void* handle) {
  delete static_cast<FastaReader*>(handle);
}

int pepper_fasta_n_sequences(void* handle) {
  return static_cast<int>(static_cast<FastaReader*>(handle)->names().size());
}

const char* pepper_fasta_sequence_name(void* handle, int i) {
  return static_cast<FastaReader*>(handle)->names()[i].c_str();
}

long long pepper_fasta_sequence_length(void* handle, const char* name) {
  return static_cast<FastaReader*>(handle)->sequence_length(name);
}

// Writes up to (stop-start) bytes into out; returns bytes written.
long long pepper_fasta_get_sequence(void* handle, const char* name,
                                    long long start, long long stop,
                                    char* out) {
  const std::string seq =
      static_cast<FastaReader*>(handle)->get_sequence(name, start, stop);
  std::memcpy(out, seq.data(), seq.size());
  return static_cast<long long>(seq.size());
}

}  // extern "C"
