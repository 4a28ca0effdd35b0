"""End-to-end example driver (examples/Main.hs parity), both paths."""
import pytest

from sonic_tpu.example import main


def test_example_golden(capsys):
    assert main(["--seed", "7"]) == 0
    assert "Success: True" in capsys.readouterr().out


@pytest.mark.slow
def test_example_device(capsys):
    assert main(["--device", "--seed", "7"]) == 0
    assert "Success: True" in capsys.readouterr().out
