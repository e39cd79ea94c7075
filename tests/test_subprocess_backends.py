"""Subprocess passthrough backends exercised via bash shims named
`skani` / `fastANI` that emit canned TSV — the same fake-backend
pattern as test_run_checkm2.py.

Contracts covered (reference src/skani.rs:109-225 triangle sparse,
:229-377 sketch+search low-memory, :379-498 contig -i name matching,
:502-687 reference-mode search, :718-788 dist empty->0.0;
src/fastani.rs:82-152 five-column parse + fragment-count AF).
"""

import os
import stat

import pytest

from galah_tpu.engines.subprocess_backends import (
    FastaniClusterer,
    SkaniClusterer,
    SkaniPreclusterer,
    check_for_binary,
)

SKANI_SHIM = r"""#!/bin/bash
[ -n "$SKANI_SHIM_LOG" ] && echo "$@" >> "$SKANI_SHIM_LOG"
sub=$1; shift
listfile=""; contig=0; db=""; ql=""; q=""; r=""; out=""
while [[ $# -gt 0 ]]; do
  case $1 in
    -l) listfile=$2; shift 2;;
    -i) contig=1; shift;;
    -o) out=$2; shift 2;;
    -d) db=$2; shift 2;;
    --ql) ql=$2; shift 2;;
    -q) q=$2; shift 2;;
    -r) r=$2; shift 2;;
    *) shift;;
  esac
done
header="Ref_file\tQuery_file\tANI\tAlign_fraction_ref\tAlign_fraction_query\tRef_name\tQuery_name"
case $sub in
  triangle)
    mapfile -t files < "$listfile"
    echo -e "$header"
    if [[ $contig == 1 ]]; then
      names=($(grep -h '^>' "${files[@]}" | sed 's/^>//; s/[ \t].*//'))
      echo -e "x\ty\t97.5\t85.0\t83.0\t${names[0]}\t${names[1]}"
      echo -e "x\ty\t91.0\t80.0\t80.0\t${names[0]}\t${names[2]}"
      if [[ -n "$SKANI_SHIM_BAD_CONTIG" ]]; then
        echo -e "x\ty\t99.0\t80.0\t80.0\tunknown_contig\t${names[1]}"
      fi
    else
      echo -e "${files[0]}\t${files[1]}\t97.5\t85.1\t83.2"
      if [[ -n "${files[2]:-}" ]]; then
        echo -e "${files[0]}\t${files[2]}\t91.0\t50.0\t50.0"
      fi
      if [[ -n "$SKANI_SHIM_BAD_PATH" ]]; then
        echo -e "/nonexistent/zzz.fna\t${files[1]}\t99.0\t90.0\t90.0"
      fi
    fi
    ;;
  sketch)
    mkdir -p "$out"
    cp "$listfile" "$out/list.txt"
    ;;
  search)
    mapfile -t refs < "$db/list.txt"
    mapfile -t queries < "$ql"
    echo -e "$header"
    echo -e "${queries[0]}\t${queries[0]}\t100.0\t100.0\t100.0"
    echo -e "${refs[0]}\t${queries[1]}\t96.0\t70.0\t72.0"
    ;;
  dist)
    echo -e "$header"
    if [[ -z "$SKANI_SHIM_DIST_EMPTY" ]]; then
      echo -e "$r\t$q\t97.8\t88.0\t86.0"
    fi
    ;;
esac
"""

FASTANI_SHIM = r"""#!/bin/bash
q=""; r=""
while [[ $# -gt 0 ]]; do
  case $1 in
    --query) q=$2; shift 2;;
    --ref) r=$2; shift 2;;
    *) shift;;
  esac
done
case $(basename "$q") in
  a.fna) echo -e "$q\t$r\t97.0\t40\t100";;
  b.fna) echo -e "$q\t$r\t96.0\t10\t100";;
  *) ;;
esac
"""


@pytest.fixture
def shim_env(tmp_path, monkeypatch):
    """Puts skani/fastANI shims on PATH; returns (genomes, log path)."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    for name, body in (("skani", SKANI_SHIM), ("fastANI", FASTANI_SHIM)):
        p = bindir / name
        p.write_text(body)
        os.chmod(p, os.stat(p).st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    log = tmp_path / "shim.log"
    monkeypatch.setenv("SKANI_SHIM_LOG", str(log))
    monkeypatch.delenv("SKANI_SHIM_DIST_EMPTY", raising=False)
    monkeypatch.delenv("SKANI_SHIM_BAD_CONTIG", raising=False)
    monkeypatch.delenv("SKANI_SHIM_BAD_PATH", raising=False)
    gdir = tmp_path / "genomes"
    gdir.mkdir()
    genomes = []
    for i, stem in enumerate(("a", "b", "c")):
        p = gdir / f"{stem}.fna"
        # a tab in one header exercises the sanitization tempfiles
        desc = "\tdescription" if i == 0 else ""
        p.write_text(f">{stem}_contig{desc}\nACGTACGTACGTACGT\n")
        genomes.append(str(p))
    return genomes, log


def test_skani_triangle_sparse_parse(shim_env):
    genomes, log = shim_env
    pre = SkaniPreclusterer(threshold=95.0, min_aligned_threshold=0.15)
    cache = pre.distances(genomes)
    # 97.5 row kept; 91.0 below threshold dropped
    assert dict(cache.items()) == {(0, 1): 97.5}
    assert "--min-af 15.0" in log.read_text()
    assert "--sparse" in log.read_text()


def test_skani_triangle_unknown_path_fatal(shim_env, monkeypatch):
    """An output path that matches no input genome signals TSV
    corruption: fatal, as in the reference (src/skani.rs:184-201) —
    never a silently dropped pair."""
    genomes, _ = shim_env
    monkeypatch.setenv("SKANI_SHIM_BAD_PATH", "1")
    pre = SkaniPreclusterer(threshold=95.0, min_aligned_threshold=0.15)
    with pytest.raises(RuntimeError, match="sanitized genome path"):
        pre.distances(genomes)


def test_skani_lowmem_refuses_small_genomes(shim_env):
    """reference src/skani.rs:243-245"""
    genomes, _ = shim_env
    pre = SkaniPreclusterer(
        threshold=95.0, min_aligned_threshold=0.15,
        low_memory=True, small_genomes=True,
    )
    with pytest.raises(ValueError, match="low-memory"):
        pre.distances(genomes)


def test_skani_triangle_small_genomes_flag(shim_env):
    genomes, log = shim_env
    pre = SkaniPreclusterer(
        threshold=95.0, min_aligned_threshold=0.15, small_genomes=True
    )
    pre.distances(genomes)
    assert "--small-genomes" in log.read_text()


def test_skani_lowmem_sketch_then_search(shim_env):
    genomes, log = shim_env
    pre = SkaniPreclusterer(
        threshold=95.0, min_aligned_threshold=0.15, low_memory=True
    )
    cache = pre.distances(genomes)
    # self-match (100.0, i==j) skipped; (refs[0]=a, queries[1]=b) kept
    assert dict(cache.items()) == {(0, 1): 96.0}
    assert "sketch" in log.read_text()


def test_skani_contig_name_matching(shim_env, tmp_path):
    """Contig mode matches the FULL Ref_name/Query_name (columns 5/6)
    against the contig-name list, not file paths
    (src/skani.rs:455-474)."""
    genomes, log = shim_env
    contig_names = ["a_contig", "b_contig", "c_contig"]
    pre = SkaniPreclusterer(threshold=95.0, min_aligned_threshold=0.15)
    cache = pre.distances_contigs(genomes, contig_names)
    # (a_contig, b_contig) 97.5 kept; 91.0 below threshold
    assert dict(cache.items()) == {(0, 1): 97.5}
    assert " -i " in log.read_text()


def test_skani_contig_unknown_name_fatal(shim_env, monkeypatch):
    """A Ref_name that matches no contig is fatal, like the
    reference's 'Failed to find contig name' panic
    (src/skani.rs:461-474) — never a silently dropped pair."""
    genomes, _ = shim_env
    monkeypatch.setenv("SKANI_SHIM_BAD_CONTIG", "1")
    pre = SkaniPreclusterer(threshold=95.0, min_aligned_threshold=0.15)
    with pytest.raises(RuntimeError, match="contig name"):
        pre.distances_contigs(
            genomes, ["a_contig", "b_contig", "c_contig"]
        )


def test_skani_reference_mode_search(shim_env):
    genomes, log = shim_env
    pre = SkaniPreclusterer(threshold=95.0, min_aligned_threshold=0.15)
    cache = pre.distances_with_references(genomes, [genomes[2]])
    # queries are a,b (indices 0,1); ref db holds c (index 2).
    # search emits a self-match (skipped) + (ref c, query b) 96.0
    assert dict(cache.items()) == {(1, 2): 96.0}
    text = log.read_text()
    assert "sketch" in text and "search" in text


def test_skani_reference_mode_refuses_small_genomes(shim_env):
    genomes, _ = shim_env
    pre = SkaniPreclusterer(
        threshold=95.0, min_aligned_threshold=0.15, small_genomes=True
    )
    with pytest.raises(ValueError, match="small genomes"):
        pre.distances_with_references(genomes, [genomes[2]])


def test_skani_dist_parse_and_empty(shim_env, monkeypatch):
    genomes, _ = shim_env
    clu = SkaniClusterer(threshold=95.0, min_aligned_threshold=0.15)
    clu.initialise()
    assert clu.calculate_ani(genomes[0], genomes[1]) == 97.8
    # below --min-af skani emits nothing: treated as ANI 0.0
    monkeypatch.setenv("SKANI_SHIM_DIST_EMPTY", "1")
    assert clu.calculate_ani(genomes[0], genomes[1]) == 0.0


def test_skani_threshold_guard(shim_env):
    with pytest.raises(ValueError, match="85"):
        SkaniPreclusterer(threshold=80.0, min_aligned_threshold=0.15)


def test_fastani_bidirectional_af_semantics(shim_env):
    genomes, _ = shim_env
    a, b = genomes[0], genomes[1]
    # a->b: 97.0 AF 0.40; b->a: 96.0 AF 0.10
    clu = FastaniClusterer(threshold=95.0, min_aligned_threshold=0.3)
    clu.initialise()
    # either direction passing AF suffices; ANI is the max of directions
    assert clu.calculate_ani(a, b) == 97.0
    assert clu.calculate_ani(b, a) == 97.0
    # both directions under AF 0.5 -> None
    strict = FastaniClusterer(threshold=95.0, min_aligned_threshold=0.5)
    assert strict.calculate_ani(a, b) is None


def test_fastani_no_output_returns_none(shim_env):
    genomes, _ = shim_env
    clu = FastaniClusterer(threshold=95.0, min_aligned_threshold=0.1)
    # the shim emits nothing for c.fna queries -> one_way None -> None
    assert clu.calculate_ani(genomes[2], genomes[0]) is None


def test_check_for_binary_missing(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))
    with pytest.raises(SystemExit, match="skani"):
        check_for_binary("skani")


def test_cli_cluster_skani_skani(shim_env, tmp_path):
    """CLI-level skani/skani clustering through the passthrough engines
    (reference tests/test_cmdline.rs:305-385 test_skani_clusterer /
    test_skani_skani_clusterer, shim-backed): the triangle output joins
    a-b at 97.5 ANI and leaves c alone at 91."""
    from galah_tpu.cli.main import main

    genomes, _ = shim_env
    out = tmp_path / "clusters.tsv"
    main([
        "cluster", "--genome-fasta-files", *genomes,
        "--precluster-method", "skani", "--cluster-method", "skani",
        "--output-cluster-definition", str(out), "-q",
    ])
    a, b, c = genomes
    assert out.read_text() == f"{a}\t{a}\n{a}\t{b}\n{c}\t{c}\n"


def test_cli_skani_precluster_native_cluster_low_af(shim_env, tmp_path):
    """Mixed methods end-to-end: skani preclusters (shim triangle), the
    native engine verifies. --min-aligned-fraction 0.001 must be
    accepted here — the native prefilter screen never runs with a skani
    preclusterer, so its bitmap-width refusal must not trigger
    (reference passes --min-af through verbatim, src/skani.rs:144-159)."""
    import shutil

    from conftest import data
    from galah_tpu.cli.main import main

    # Real MAGs so the native verify stage has actual fragments; copied
    # next to each other so the shim's triangle list is just these two.
    g1 = tmp_path / "S1D.21.fna"
    g2 = tmp_path / "S2M.16.fna"
    shutil.copy(data("abisko4/73.20120800_S1D.21.fna"), g1)
    shutil.copy(data("abisko4/73.20110800_S2M.16.fna"), g2)
    out = tmp_path / "clusters.tsv"
    main([
        "cluster", "--genome-fasta-files", str(g1), str(g2),
        "--precluster-method", "skani", "--cluster-method", "native",
        "--min-aligned-fraction", "0.001",
        "--output-cluster-definition", str(out), "-q",
    ])
    # shim joins the pair at 97.5; native verify confirms (these MAGs
    # are >=95 ANI); no quality info -> first input is representative.
    assert out.read_text() == f"{g1}\t{g1}\n{g1}\t{g2}\n"
