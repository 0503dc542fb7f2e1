"""CLI input validation: fail fast with clear per-file errors
(reference: parseCmdArgs.hpp:59-90 validateInputFiles)."""

import pytest

from fastani_tpu import cli


def test_missing_genome_file_exits(tmp_path, capsys):
    good = tmp_path / "g.fa"
    good.write_text(">g\nACGTACGT\n")
    with pytest.raises(SystemExit) as e:
        cli.main(["-q", str(good), "-r", str(tmp_path / "nope.fa"),
                  "-o", str(tmp_path / "out.txt")])
    assert e.value.code == 1
    err = capsys.readouterr().err
    assert "nope.fa" in err and "could not open" in err


def test_empty_genome_file_exits(tmp_path, capsys):
    good = tmp_path / "g.fa"
    good.write_text(">g\nACGTACGT\n")
    empty = tmp_path / "empty.fa"
    empty.write_text("")
    with pytest.raises(SystemExit) as e:
        cli.main(["-q", str(empty), "-r", str(good),
                  "-o", str(tmp_path / "out.txt")])
    assert e.value.code == 1
    assert "empty.fa" in capsys.readouterr().err


def test_missing_list_entry_exits(tmp_path, capsys):
    good = tmp_path / "g.fa"
    good.write_text(">g\nACGTACGT\n")
    lst = tmp_path / "refs.txt"
    lst.write_text(f"{good}\n{tmp_path/'gone.fa'}\n")
    with pytest.raises(SystemExit) as e:
        cli.main(["-q", str(good), "--rl", str(lst),
                  "-o", str(tmp_path / "out.txt")])
    assert e.value.code == 1
    assert "gone.fa" in capsys.readouterr().err
