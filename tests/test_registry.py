from apex_studio_tpu.registry import Registry


def test_register_and_get():
    r = Registry("thing")

    @r.register("a")
    def fa():
        return "a"

    @r.register("b", default=True)
    def fb():
        return "b"

    assert r.get()() == "b"
    assert r.get("a")() == "a"
    assert r["a"] is fa
    assert "a" in r and "zz" not in r
    assert sorted(r.names()) == ["a", "b"]


def test_first_registration_becomes_default():
    r = Registry("t")
    r.add("only", object())
    assert r.default == "only"


def test_availability_gating():
    r = Registry("t")
    r.add("x", 1, default=True)
    r.add("y", 2)
    r.set_available("x", False)
    assert r.names() == ["y"]
    assert r.names(include_unavailable=True) == ["x", "y"]
    assert not r.is_available("x")
    # default fell over to a live entry
    assert r.default == "y"


def test_aliases_resolve_and_dedupe():
    r = Registry("t")
    r.add("canonical", 42, aliases=("alt",))
    assert r.get("alt") == 42
    assert r.names() == ["canonical"]


def test_meta_kwargs():
    r = Registry("t")
    r.add("k", 7, needs_tpu=True)
    assert r.meta("k")["needs_tpu"] is True
