from .bam import BamReader, ReadBatch
from .fasta import FastaReader
