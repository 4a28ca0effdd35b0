"""End-to-end example driver (examples/Main.hs parity), host path."""
from sonic_tpu.example import main


def test_example_golden(capsys):
    assert main(["--seed", "7"]) == 0
    assert "Success: True" in capsys.readouterr().out
