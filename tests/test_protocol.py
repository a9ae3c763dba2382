"""Protocol adapter: byte-exact responses, mirroring the reference's
integration suite (/root/reference/integ/test_integ.py:74-395) against
handle_command instead of a TCP socket."""

import pytest

from hlld_spark.protocol import CommandHandler
from hlld_spark.registry import SketchRegistry


@pytest.fixture()
def h(tmp_path):
    return CommandHandler(SketchRegistry(str(tmp_path / "data")))


def test_list_empty(h):
    assert h.handle_command("list\n") == "START\nEND\n"


def test_create_and_list(h):
    assert h.handle_command("create foobar\n") == "Done\n"
    out = h.handle_command("list\n")
    assert out.startswith("START\n") and out.endswith("END\n")
    assert "foobar" in out


def test_list_prefix(h):
    for n in ("foobar", "foobaz", "test"):
        assert h.handle_command(f"create {n}\n") == "Done\n"
    out = h.handle_command("list foo\n")
    assert "foobar" in out and "foobaz" in out and "test" not in out


def test_create_bad_name(h):
    assert h.handle_command("create " + "foo" * 100 + "\n") == "Client Error: Bad set name\n"


def test_double_create(h):
    assert h.handle_command("create foobar\n") == "Done\n"
    assert h.handle_command("create foobar\n") == "Exists\n"


def test_drop(h):
    h.handle_command("create foobar\n")
    assert h.handle_command("drop foobar\n") == "Done\n"
    assert h.handle_command("list\n") == "START\nEND\n"


def test_close_keeps_listed(h):
    h.handle_command("create foobar\n")
    assert h.handle_command("close foobar\n") == "Done\n"
    assert "foobar" in h.handle_command("list\n")


def test_clear_not_proxied_then_close_clear(h):
    h.handle_command("create cleartest\n")
    assert h.handle_command("clear cleartest\n") == "Set is not proxied. Close it first.\n"
    assert "cleartest" in h.handle_command("list\n")
    assert h.handle_command("close cleartest\n") == "Done\n"
    assert h.handle_command("clear cleartest\n") == "Done\n"
    assert h.handle_command("list\n") == "START\nEND\n"
    # re-create rediscovers the on-disk data (integ test_integ.py:160-195)
    assert h.handle_command("create cleartest\n") == "Done\n"


def test_set_and_bulk(h):
    h.handle_command("create s\n")
    assert h.handle_command("set s key1\n") == "Done\n"
    assert h.handle_command("s s key2\n") == "Done\n"
    assert h.handle_command("bulk s a b c d\n") == "Done\n"
    assert h.handle_command("b s e f\n") == "Done\n"
    info = h.handle_command("info s\n")
    assert info.startswith("START\n") and info.endswith("END\n")
    assert "sets 8\n" in info
    assert "size 8\n" in info
    assert "precision 12\n" in info
    assert "storage 3280\n" in info
    assert "epsilon 0.016250\n" in info


def test_set_missing(h):
    assert h.handle_command("set nope key\n") == "Set does not exist\n"
    assert h.handle_command("info nope\n") == "Set does not exist\n"
    assert h.handle_command("drop nope\n") == "Set does not exist\n"


def test_arg_errors(h):
    assert h.handle_command("set onlyname\n") == "Client Error: Must provide set name and key\n"
    assert h.handle_command("create\n") == "Client Error: Must provide set name\n"
    assert h.handle_command("info\n") == "Client Error: Must provide set name\n"
    assert h.handle_command("info a b\n") == "Client Error: Unexpected arguments\n"
    assert h.handle_command("frobnicate x\n") == "Client Error: Command not supported\n"
    assert h.handle_command("create x badopt=1\n") == "Client Error: Bad arguments\n"


def test_create_options(h):
    assert h.handle_command("create p precision=14\n") == "Done\n"
    assert "precision 14\n" in h.handle_command("info p\n")
    assert h.handle_command("create e eps=0.01\n") == "Done\n"
    assert "precision 14\n" in h.handle_command("info e\n")
    assert h.handle_command("create m in_memory=1\n") == "Done\n"
    assert "in_memory 1\n" in h.handle_command("info m\n")


def test_flush_all_and_named(h):
    h.handle_command("create f1\n")
    h.handle_command("set f1 k\n")
    assert h.handle_command("flush f1\n") == "Done\n"
    assert h.handle_command("flush\n") == "Done\n"
    assert h.handle_command("flush missing\n") == "Set does not exist\n"


def test_pending_delete(h, tmp_path):
    h.handle_command("create pd\n")
    h.reg.drop("pd", defer_vacuum=True)
    assert h.handle_command("create pd\n") == "Delete in progress\n"
    h.reg.vacuum()
    assert h.handle_command("create pd\n") == "Done\n"


def test_crlf_handling(h):
    assert h.handle_command("create crlf\r\n") == "Done\n"
    assert h.handle_command("list\r\n").count("crlf") == 1


def test_list_line_format(h):
    h.handle_command("create fmt precision=10\n")
    h.handle_command("bulk fmt a b c\n")
    out = h.handle_command("list fmt\n")
    line = out.splitlines()[1]
    name, eps, prec, nbytes, est = line.split(" ")
    assert name == "fmt" and eps == "0.032500" and prec == "10"
    assert nbytes == "820" and est == "3"


def test_create_option_validation_rejects_not_clamps(h):
    """ADVICE parity fix vs sane_default_* (src/config.c:264-337):
    out-of-range eps/precision and in_memory∉{0,1} are Bad arguments —
    never clamped into range."""
    assert h.handle_command("create a eps=0.001\n") == "Client Error: Bad arguments\n"
    assert h.handle_command("create a eps=0.9\n") == "Client Error: Bad arguments\n"
    assert h.handle_command("create a precision=3\n") == "Client Error: Bad arguments\n"
    assert h.handle_command("create a precision=19\n") == "Client Error: Bad arguments\n"
    assert h.handle_command("create a in_memory=2\n") == "Client Error: Bad arguments\n"
    assert h.handle_command("create a in_memory=-1\n") == "Client Error: Bad arguments\n"
    # the failed creates must not have registered the set
    assert h.handle_command("list\n") == "START\nEND\n"
    assert h.handle_command("create a eps=0.005 in_memory=1\n") == "Done\n"


def test_create_options_apply_in_wire_order(h):
    """conn_handler.c applies options sequentially — last one wins."""
    assert h.handle_command("create p_then_e precision=10 eps=0.01\n") == "Done\n"
    assert "precision 14" in h.handle_command("info p_then_e\n")
    assert h.handle_command("create e_then_p eps=0.01 precision=10\n") == "Done\n"
    assert "precision 10" in h.handle_command("info e_then_p\n")
