"""stages/markdown.py: frozen HTML -> Markdown subset."""

import pandas as pd

from pdf_extract_ray.stages.markdown import html_to_markdown, to_markdown_batch


def test_markdown_structural_elements():
    h = ("<h1>Main  Title</h1><h3>Sub</h3>"
         "<p>Hello <strong>bold</strong> and <em>it</em>.</p>")
    assert html_to_markdown(h) == (
        "# Main Title\n\n### Sub\n\nHello **bold** and *it*.")


def test_markdown_links_images_and_bad_schemes():
    h = ('<p><a href="/x?a=1">a link</a> then '
         '<a href="javascript:x()">bad</a> and '
         '<img src="/i.png" alt="pic  here"> end</p>')
    assert html_to_markdown(h) == (
        "[a link](/x?a=1) then bad and ![pic here](/i.png) end")


def test_markdown_lists_nested_and_ordered():
    h = ("<ul><li>one</li><li>two</li>"
         "<ol><li>n1</li><li>n2</li></ol></ul>")
    assert html_to_markdown(h) == (
        "- one\n\n- two\n\n  1. n1\n\n  2. n2")


def test_markdown_blockquote_and_pre():
    h = ("<blockquote><p>quoted</p><pre>raw\n  code</pre></blockquote>"
         "<p>after</p>")
    assert html_to_markdown(h) == (
        "> quoted\n\n> ```\n> raw\n>   code\n> ```\n\nafter")
    # inline code outside pre
    assert html_to_markdown("<p>use <code>f()</code></p>") == "use `f()`"


def test_markdown_chrome_and_robustness():
    h = ("<title>T</title><nav>skip</nav><script>x=1</script>"
         "<header>chrome</header><p>kept</p>")
    assert html_to_markdown(h) == "kept"
    # malformed input never raises, bytes decode, None/empty collapse
    assert html_to_markdown("broken <b>no close") == "broken **no close"
    assert html_to_markdown(b"<p>bytes \xc3\xa9</p>") == "bytes é"
    assert html_to_markdown(None) == ""
    assert html_to_markdown("<p></p><p>  </p>") == ""


def test_markdown_batch_schema():
    df = pd.DataFrame({"url": ["u1", "u2"],
                       "html": ["<h2>x</h2>", None]})
    out = to_markdown_batch(df)
    assert out["markdown"].tolist() == ["## x", ""]
    assert out["n_md_chars"].tolist() == [4, 0]
    assert list(out.columns) == ["url", "markdown", "n_md_chars"]
