

def test_protocol_relative_ref_loses_dot_segments():
    """Go's ResolveReference normalizes dot segments whenever the ref is
    absolute OR protocol-relative (ref.Scheme != '' || ref.Host != '')."""
    from go_readability_spark.kernel.urlfix import to_absolute_uri

    assert (
        to_absolute_uri(
            "//cdn.example.com/a/../img.png",
            "http://host/page",
            "http://host/page",
        )
        == "http://cdn.example.com/img.png"
    )
