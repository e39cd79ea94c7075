from galah_tpu.quality.checkm import (  # noqa: F401
    CheckMResult,
    GenomeQuality,
    read_checkm1_tab_table,
    read_checkm2_quality_report,
    read_genome_info_file,
)
from galah_tpu.quality.filter import filter_and_order_genomes  # noqa: F401
