from leann_tpu.index.filter import MetadataFilter


def m(**kw):
    return kw


def test_parse_simple_glob():
    f = MetadataFilter.parse("source:*.rs")
    assert f.matches(m(source="main.rs"))
    assert not f.matches(m(source="main.py"))


def test_eq_and_colon():
    assert MetadataFilter.parse("type=code").matches(m(type="code"))
    assert MetadataFilter.parse("type:code").matches(m(type="code"))
    assert not MetadataFilter.parse("type=code").matches(m(type="text"))


def test_numeric_comparisons():
    f = MetadataFilter.parse("lines>50")
    assert f.matches(m(lines=51))
    assert not f.matches(m(lines=50))
    assert MetadataFilter.parse("lines>=50").matches(m(lines=50))
    assert MetadataFilter.parse("lines<=50").matches(m(lines=50))
    assert MetadataFilter.parse("lines<50").matches(m(lines=49))
    assert MetadataFilter.parse("lines!=50").matches(m(lines=49))
    assert not MetadataFilter.parse("lines!=50").matches(m(lines=50))


def test_and_comma():
    f = MetadataFilter.parse("type=code,lines>50")
    assert f.matches(m(type="code", lines=51))
    assert not f.matches(m(type="code", lines=10))
    assert not f.matches(m(type="text", lines=51))


def test_and_keyword():
    f = MetadataFilter.parse("type=code AND lines>50")
    assert f.matches(m(type="code", lines=51))
    assert not f.matches(m(type="text", lines=51))


def test_or_lower_precedence():
    f = MetadataFilter.parse("type=code OR type=text,lines>5")
    # OR splits first: (type=code) OR (type=text AND lines>5)
    assert f.matches(m(type="code", lines=0))
    assert f.matches(m(type="text", lines=6))
    assert not f.matches(m(type="text", lines=1))


def test_in_not_in():
    f = MetadataFilter.parse("type in [code,text,doc]")
    assert f.matches(m(type="text"))
    assert not f.matches(m(type="image"))
    g = MetadataFilter.parse("type not_in [code,text]")
    assert g.matches(m(type="doc"))
    assert not g.matches(m(type="code"))
    # not_in matches when field missing
    assert g.matches(m(other=1))


def test_in_with_and_comma_inside_brackets():
    f = MetadataFilter.parse("type in [code,text],lines>5")
    assert f.matches(m(type="code", lines=6))
    assert not f.matches(m(type="code", lines=1))


def test_sugar_ops():
    assert MetadataFilter.parse("source~key").matches(m(source="a key b"))
    assert MetadataFilter.parse("source^pre").matches(m(source="prefix"))
    assert MetadataFilter.parse("source$fix").matches(m(source="prefix"))
    assert MetadataFilter.parse("field?").matches(m(field=1))
    assert not MetadataFilter.parse("field?").matches(m(other=1))


def test_glob_forms():
    assert MetadataFilter.parse("source:*mid*").matches(m(source="a mid b"))
    assert MetadataFilter.parse("source:pre*").matches(m(source="prefix"))
    assert MetadataFilter.parse("source:*fix").matches(m(source="prefix"))


def test_nested_path():
    f = MetadataFilter.parse("a.b=3")
    assert f.matches({"a": {"b": 3}})
    assert not f.matches({"a": {"b": 4}})
    assert not f.matches({"a": 3})


def test_bool_values():
    assert MetadataFilter.parse("flag=true").matches(m(flag=True))
    assert not MetadataFilter.parse("flag=true").matches(m(flag=False))


def test_ne_on_missing_field_is_true():
    assert MetadataFilter.parse("x!=3").matches(m(y=1))
