from galah_tpu.io.fasta import (  # noqa: F401
    FastaRecord,
    read_fasta,
    read_fasta_sequences,
    contig_names,
    sanitize_header,
)
from galah_tpu.io.genome_stats import (  # noqa: F401
    GenomeAssemblyStats,
    calculate_genome_stats,
)
