from ocr_sam_project_ray.pipelines.metrics import stage_metrics


class _FakeDs:
    def __init__(self, s):
        self._s = s

    def stats(self):
        return self._s


def test_stage_metrics_parses_operator_blocks():
    raw = (
        "Operator 1 ReadParquet: stuff\n"
        "   * Total time: 1.25s\n"
        "Operator 2 MapBatches(validate): stuff\n"
        "   * Total time: 3.5s\n"
    )
    assert stage_metrics(_FakeDs(raw)) == {
        "ReadParquet:": 1.25, "MapBatches(validate):": 3.5,
    }


def test_stage_metrics_graceful_on_empty_or_error():
    assert stage_metrics(_FakeDs("")) == {}

    class Boom:
        def stats(self):
            raise RuntimeError("no stats")

    assert stage_metrics(Boom()) == {}
