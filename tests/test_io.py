import gzip

from conftest import data

from galah_tpu.io import calculate_genome_stats, contig_names, read_fasta


def test_genome_stats_golden():
    # Reference golden (src/genome_stats.rs:61-73)
    stats = calculate_genome_stats(data("abisko4/73.20110600_S2D.10.fna"))
    assert stats.num_contigs == 161
    assert stats.num_ambiguous_bases == 6506
    assert stats.n50 == 8289


def test_genome_stats_one_contig():
    # Reference golden (src/genome_stats.rs:75-88)
    stats = calculate_genome_stats(data("set1/1mbp.fna"))
    assert stats.num_contigs == 1
    assert stats.num_ambiguous_bases == 0
    assert stats.n50 == 1_000_000


def test_gzip_transparent():
    plain = list(read_fasta(data("abisko4/73.20110800_S2M.16.fna")))
    gz = list(read_fasta(data("abisko4/73.20110800_S2M.16.fna.gz")))
    assert len(plain) == len(gz)
    assert all(a.seq == b.seq and a.name == b.name for a, b in zip(plain, gz))


def test_contig_names():
    names = contig_names(data("contigs/contigs.fna"))
    assert names == [
        "73.20110600_S2D.10_contig_13024",
        "73.20110600_S2D.10_contig_13024_2",
        "73.20110600_S2D.10_contig_50844",
        "73.20110600_S2D.10_contig_37820",
    ]


def test_tab_headers_preserved_and_sanitized(tmp_path):
    p = tmp_path / "tabbed.fna"
    p.write_text(">seq1\tfoo bar\nACGT\n")
    recs = list(read_fasta(str(p)))
    assert recs[0].name == "seq1\tfoo bar"
    assert recs[0].contig_name == "seq1"
    assert recs[0].sanitized_name == "seq1 foo bar"


def test_gzip_magic_sniffing(tmp_path):
    # gz content with a non-.gz extension must still parse
    p = tmp_path / "genome.fna"
    p.write_bytes(gzip.compress(b">c1\nACGTACGT\n"))
    recs = list(read_fasta(str(p)))
    assert recs[0].seq == b"ACGTACGT"


def test_decompressed_size_estimate(tmp_path):
    """Gzip files must report their ISIZE trailer (true uncompressed
    length), not the ~4x smaller compressed size — sizing sketch
    bitmaps off the compressed size silently shrinks them below what
    the genomes need. Plain files report their file size."""
    from galah_tpu.io.fasta import decompressed_size_estimate

    body = b">c1\n" + b"ACGT" * 100_000 + b"\n"
    plain = tmp_path / "a.fna"
    plain.write_bytes(body)
    assert decompressed_size_estimate(str(plain)) == len(body)

    gz = tmp_path / "a.fna.gz"
    gz.write_bytes(gzip.compress(body))
    est = decompressed_size_estimate(str(gz))
    assert est == len(body)
    assert gz.stat().st_size < len(body) // 10  # compressed is far smaller

    # Multi-member gzip (cat a.gz b.gz): ISIZE is only the LAST member's
    # length; the 3x-compressed floor must keep the estimate from
    # collapsing to the small tail member.
    tiny = b">t\nACGT\n"
    multi = tmp_path / "m.fna.gz"
    multi.write_bytes(gzip.compress(body) + gzip.compress(tiny))
    est_multi = decompressed_size_estimate(str(multi))
    assert est_multi >= 3 * multi.stat().st_size
    assert est_multi > len(tiny)  # not fooled by the last member's ISIZE


def test_tool_docs_current():
    """docs/tools/*.md are generated from the live argparse tree; this
    guards against flag changes drifting from the published docs
    (regenerate with `python docs/gen_tool_docs.py`)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "docs", "gen_tool_docs.py"),
         "--check"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
