"""HTML -> text extractor: adversarial fragments (script CDATA, comments,
entities, quoted '>' in attributes, unclosed/self-closing tags), block vs
inline line semantics, and the Spark UDF surface."""

from __future__ import annotations

from pincspark.operators.html import extract_html, html_to_text


def test_block_vs_inline():
    title, text = extract_html("<p>a<b>b</b>c</p><p>d</p>")
    assert text == "abc\nd"


def test_script_style_comment_dropped():
    html = (
        "<script>if (a < b) { document.write('<p>junk</p>'); }</script>"
        "<style>p { color: red }</style>"
        "<!-- <p>commented out</p> -->"
        "<p>real</p>"
    )
    assert extract_html(html)[1] == "real"


def test_entities_decoded():
    _, text = extract_html("<p>Fish &amp; Chips &#65; &copy; &lt;tag&gt;</p>")
    assert text == "Fish & Chips A © <tag>"


def test_quoted_gt_in_attribute():
    _, text = extract_html('<p><a title="a>b" href="/x">link</a> text</p>')
    assert text == "link text"


def test_unclosed_and_selfclosing():
    _, text = extract_html("<p>one<br/>two<p>three")
    assert text == "one\ntwo\nthree"


def test_title_separate_from_body():
    title, text = extract_html(
        "<html><head><title>The  Title </title></head><body><p>body</p></body></html>"
    )
    assert title == "The Title"
    assert text == "body"


def test_whitespace_collapse_and_empty():
    assert extract_html("")[1] == ""
    assert extract_html("   \n\t  ")[1] == ""
    _, text = extract_html("<p>  a \n\n  b\t c  </p>")
    assert text == "a b c"


def test_nested_skip_tags():
    # a script inside a script-opened region stays skipped until balance
    html = "<div><script>x</script>kept<style>y</style></div>"
    assert extract_html(html)[1] == "kept"


def test_udf_surface(spark):
    df = spark.createDataFrame(
        [("<title>t</title><p>a</p>",), (None,)], "html string"
    )
    rows = df.select(html_to_text("html").alias("x")).collect()
    assert (rows[0]["x"]["title"], rows[0]["x"]["text"]) == ("t", "a")
    assert rows[1]["x"]["text"] == ""
