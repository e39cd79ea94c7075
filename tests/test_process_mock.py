"""Full `process` pipeline with per-genome mocked external tools and
exact MIMAG + cluster goldens — ports of the reference's
test_process_mock / _low_memory / _invert / _with_reference_genomes
(reference tests/test_process.rs:100-420; mock pattern mirrors its
setup_mock_bin)."""

import os
import stat

from conftest import data

from galah_tpu.cli.main import main

HEADER = (
    "genome\tcompleteness\tcontamination\trRNA_5S\trRNA_16S\trRNA_23S"
    "\ttRNAs\tMIMAG_quality\n"
)

AAS = [
    "Ala", "Arg", "Asn", "Asp", "Cys", "Gln", "Glu", "Gly", "His", "Ile",
    "Leu", "Lys", "Met", "Phe", "Pro", "Ser", "Thr", "Trp", "Tyr", "Val",
]


def setup_mock_bin(d, rows):
    """rows: [(stem, completeness, contamination, r5s, r16s, r23s,
    trnas)] — builds checkm2 / barrnap / tRNAscan-SE shims emitting
    exactly those values per genome."""
    # checkm2: one quality report covering every genome
    lines = [
        "#!/bin/bash",
        'out=""',
        "while [[ $# -gt 0 ]]; do case $1 in -o) out=$2; shift 2;; *) shift;; esac; done",
        'mkdir -p "$out"',
        "echo -e 'Name\\tCompleteness\\tContamination\\tModel' > \"$out/quality_report.tsv\"",
    ]
    for stem, comp, cont, *_ in rows:
        lines.append(
            f"echo -e '{stem}\\t{comp}\\t{cont}\\tGB' >> \"$out/quality_report.tsv\""
        )
    _write(d, "checkm2", lines)

    # barrnap: GFF rows on stdout, per-stem counts, bac kingdom only
    lines = [
        "#!/bin/bash",
        'kingdom=""; genome=""',
        "while [[ $# -gt 0 ]]; do case $1 in --kingdom) kingdom=$2; shift 2;; "
        "--threads) shift 2;; *) genome=$1; shift;; esac; done",
        '[ "$kingdom" != bac ] && exit 0',
        'stem=$(basename "$genome"); stem="${stem%.*}"',
        'emit() { for _ in $(seq 1 $2); do '
        'echo -e "c1\\tbarrnap:0.9\\trRNA\\t1\\t9\\t0\\t+\\t.\\tName=${1}_rRNA;product=x"; '
        "done; }",
        'case "$stem" in',
    ]
    for stem, _, _, r5, r16, r23, _ in rows:
        lines.append(
            f"  {stem}) emit 5S {r5}; emit 16S {r16}; emit 23S {r23};;"
        )
    lines += ["esac"]
    _write(d, "barrnap", lines)

    # tRNAscan-SE: N unique standard tRNAs in the -o file, -B mode only
    lines = [
        "#!/bin/bash",
        'out=""; genome=""; mode=""',
        "while [[ $# -gt 0 ]]; do case $1 in -o) out=$2; shift 2;; "
        "--thread) shift 2;; -B|-A) mode=$1; shift;; *) genome=$1; shift;; esac; done",
        'printf "h\\nh\\nh\\n" > "$out"',
        '[ "$mode" != -B ] && exit 0',
        'stem=$(basename "$genome"); stem="${stem%.*}"',
        'aas=""',
        'case "$stem" in',
    ]
    for stem, *_, trnas in rows:
        lines.append(f'  {stem}) aas="{" ".join(AAS[:trnas])}";;')
    lines += [
        "esac",
        "n=1",
        'for aa in $aas; do echo -e "c1\\t$n\\t1\\t70\\t$aa\\tNNN\\t0\\t0\\t50.0" >> "$out"; n=$((n+1)); done',
    ]
    _write(d, "tRNAscan-SE", lines)


def _write(d, name, lines):
    p = os.path.join(d, name)
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.chmod(p, os.stat(p).st_mode | stat.S_IEXEC)


def _env(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
    monkeypatch.setenv("CHECKM2DB", "/tmp/mockdb")


GENOMES4 = [
    data("set1/1mbp.fna"),
    data("set1/500kb.fna"),
    data("abisko4/73.20120800_S1D.21.fna"),
    data("abisko4/73.20110800_S2M.16.fna"),
]

MOCK_ROWS = [
    ("73.20120800_S1D.21", 95.0, 2.0, 1, 1, 1, 20),
    ("73.20110800_S2M.16", 90.0, 5.0, 1, 1, 1, 20),
    ("1mbp", 85.0, 3.0, 1, 1, 1, 15),
    ("500kb", 80.0, 4.0, 0, 1, 0, 10),
]

MOCK_MIMAG = (
    HEADER
    + f"{GENOMES4[0]}\t85.00\t3.00\t1\t1\t1\t15\tMedium quality\n"
    + f"{GENOMES4[1]}\t80.00\t4.00\t0\t1\t0\t10\tMedium quality\n"
    + f"{GENOMES4[2]}\t95.00\t2.00\t1\t1\t1\t20\tHigh quality\n"
    + f"{GENOMES4[3]}\t90.00\t5.00\t1\t1\t1\t20\tMedium quality\n"
)

MOCK_CLUSTERS = (
    f"{GENOMES4[2]}\t{GENOMES4[2]}\n"
    f"{GENOMES4[2]}\t{GENOMES4[3]}\n"
    f"{GENOMES4[0]}\t{GENOMES4[0]}\n"
    f"{GENOMES4[0]}\t{GENOMES4[1]}\n"
)


def _run_process(tmp_path, extra=()):
    mimag = tmp_path / "mimag_summary.tsv"
    quality = tmp_path / "quality_report.tsv"
    clusters = tmp_path / "clusters.tsv"
    rc = main([
        "process", "--genome-fasta-files", *GENOMES4, *extra,
        "--output-cluster-definition", str(clusters),
        "--output-mimag-summary", str(mimag),
        "--output-quality-report", str(quality),
    ])
    assert rc == 0
    return mimag, quality, clusters


def test_process_mock(tmp_path, monkeypatch):
    """tests/test_process.rs:100-218: exact cluster + MIMAG goldens;
    quality report injected so the 95%-complete genome leads."""
    setup_mock_bin(str(tmp_path), MOCK_ROWS)
    _env(tmp_path, monkeypatch)
    mimag, quality, clusters = _run_process(tmp_path)
    assert open(clusters).read() == MOCK_CLUSTERS
    assert open(mimag).read() == MOCK_MIMAG
    assert quality.exists()


def test_process_mock_low_memory(tmp_path, monkeypatch):
    """tests/test_process.rs:220-286: same goldens with --low-memory
    (disk-backed sketch store / streaming screen)."""
    setup_mock_bin(str(tmp_path), MOCK_ROWS)
    _env(tmp_path, monkeypatch)
    mimag, quality, clusters = _run_process(tmp_path, extra=("--low-memory",))
    assert open(clusters).read() == MOCK_CLUSTERS
    assert open(mimag).read() == MOCK_MIMAG
    assert quality.exists()


def test_process_mock_invert(tmp_path, monkeypatch):
    """tests/test_process.rs:288-353: inverted qualities invert the
    representatives."""
    rows = [
        ("1mbp", 80.0, 4.0, 0, 1, 0, 10),
        ("500kb", 85.0, 3.0, 1, 1, 1, 15),
        ("73.20120800_S1D.21", 90.0, 5.0, 1, 1, 1, 20),
        ("73.20110800_S2M.16", 95.0, 2.0, 1, 1, 1, 20),
    ]
    setup_mock_bin(str(tmp_path), rows)
    _env(tmp_path, monkeypatch)
    mimag, quality, clusters = _run_process(tmp_path)
    assert open(clusters).read() == (
        f"{GENOMES4[3]}\t{GENOMES4[3]}\n"
        f"{GENOMES4[3]}\t{GENOMES4[2]}\n"
        f"{GENOMES4[1]}\t{GENOMES4[1]}\n"
        f"{GENOMES4[1]}\t{GENOMES4[0]}\n"
    )
    assert open(mimag).read() == (
        HEADER
        + f"{GENOMES4[0]}\t80.00\t4.00\t0\t1\t0\t10\tMedium quality\n"
        + f"{GENOMES4[1]}\t85.00\t3.00\t1\t1\t1\t15\tMedium quality\n"
        + f"{GENOMES4[2]}\t90.00\t5.00\t1\t1\t1\t20\tMedium quality\n"
        + f"{GENOMES4[3]}\t95.00\t2.00\t1\t1\t1\t20\tHigh quality\n"
    )
    assert quality.exists()


def test_process_mock_with_reference_genomes(tmp_path, monkeypatch):
    """tests/test_process.rs:355-420: reference-mode process; analyse
    outputs cover only the non-reference genomes."""
    rows = [
        ("1mbp", 80.0, 4.0, 0, 1, 0, 10),
        ("500kb", 85.0, 3.0, 1, 1, 1, 15),
        ("73.20120800_S1X.13", 90.0, 5.0, 1, 1, 1, 20),
        ("73.20120600_S2D.19", 95.0, 2.0, 1, 1, 1, 20),
    ]
    setup_mock_bin(str(tmp_path), rows)
    _env(tmp_path, monkeypatch)
    queries = [data("abisko4/73.20120800_S1X.13.fna"), data("set1/500kb.fna")]
    refs = [data("set1/1mbp.fna"), data("abisko4/73.20120600_S2D.19.fna")]
    mimag = tmp_path / "mimag_summary.tsv"
    quality = tmp_path / "quality_report.tsv"
    clusters = tmp_path / "clusters.tsv"
    rc = main([
        "process", "--genome-fasta-files", *queries,
        "--reference-genomes", *refs,
        "--precluster-ani", "90", "--ani", "95",
        "--output-cluster-definition", str(clusters),
        "--output-mimag-summary", str(mimag),
        "--output-quality-report", str(quality),
    ])
    assert rc == 0
    assert open(clusters).read() == (
        f"{refs[1]}\t{refs[1]}\n"
        f"{refs[1]}\t{queries[0]}\n"
        f"{queries[1]}\t{queries[1]}\n"
        f"{queries[1]}\t{refs[0]}\n"
    )
    assert open(mimag).read() == (
        HEADER
        + f"{queries[0]}\t90.00\t5.00\t1\t1\t1\t20\tMedium quality\n"
        + f"{queries[1]}\t85.00\t3.00\t1\t1\t1\t15\tMedium quality\n"
    )
    assert quality.exists()
