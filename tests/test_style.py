"""Feature-style tools (autotest/ogr/ogr_style.py surface +
OGRStyleMgr parsing over the drivers' own golden style strings)."""

from __future__ import annotations

from gdal_spark.functions import style as S


def test_style_table_flow(tmp_path):                # ogr_style_styletable
    st = S.StyleTable()
    assert st.add_style("style1_normal",
                        'SYMBOL(id:"http://style1_normal",c:#67452301)')
    assert not st.save("/nonexisting/dir/out.txt")
    out = str(tmp_path / "out.txt")
    assert st.save(out)

    st2 = S.StyleTable()
    assert not st2.load("/nonexisting")
    assert st2.load(out)
    assert st2.find("non_existing_style") is None
    assert st2.find("style1_normal") == \
        'SYMBOL(id:"http://style1_normal",c:#67452301)'
    assert st2.get_next_style() == \
        'SYMBOL(id:"http://style1_normal",c:#67452301)'
    assert st2.get_last_style_name() == "style1_normal"
    assert st2.get_next_style() is None
    st2.reset_style_string_reading()
    assert st2.get_next_style() is not None


def test_parse_driver_golden_styles():
    # the DGN text golden: quoted value with spaces, sizes, font
    tools = S.parse_style(
        'LABEL(t:"Demo Text",c:#ffffff,s:1.000g,f:ENGINEERING)')
    assert tools[0][0] == "LABEL"
    assert tools[0][1]["t"] == "Demo Text"
    assert tools[0][1]["c"] == "#ffffff"
    assert S.style_value(tools[0][1]["s"]) == (1.0, "g")
    # the MIF/DGN brush-then-pen composite
    tools = S.parse_style('BRUSH(fc:#b40000,id:"ogr-brush-0");'
                          'PEN(id:"ogr-pen-0",c:#b40000,w:2px)')
    assert [t for t, _ in tools] == ["BRUSH", "PEN"]
    assert tools[1][1]["w"] == "2px"
    assert S.style_value(tools[1][1]["w"]) == (2.0, "px")
    # escaped quotes inside a quoted value (the DXF mtext golden)
    tools = S.parse_style('LABEL(t:"Text \\"abc\\"",s:0.5g)')
    assert tools[0][1]["t"] == 'Text "abc"'


def test_build_style_roundtrip():
    tools = [("PEN", {"c": "#ff0000", "w": "5pt", "p": "2px 1pt"})]
    s = S.build_style(tools)
    assert s == 'PEN(c:#ff0000,w:5pt,p:"2px 1pt")'
    assert S.parse_style(s) == [("PEN", {"c": "#ff0000", "w": "5pt",
                                         "p": "2px 1pt"})]
    assert S.style_param(s, "pen", "p") == "2px 1pt"
    assert S.style_param(s, "pen", "nope") is None
    assert S.style_param(s, "label", "t") is None


def test_style_param_column(spark):
    df = spark.createDataFrame(
        [(0, 'PEN(c:#ff0000,w:5pt)'), (1, 'LABEL(t:"x",c:#00ff00)'),
         (2, None)], "fid long, ogr_style string")
    got = df.select(
        "fid", S.style_param_col(df.ogr_style, "PEN", "c").alias("c")) \
        .orderBy("fid").collect()
    assert [r["c"] for r in got] == ["#ff0000", None, None]
