"""Spatial join (both strategies) vs brute-force oracle — set equality."""

import pytest

from geospatial_studio_pipelines_spark import datagen
from geospatial_studio_pipelines_spark.operators import footprints, spatial_join


@pytest.fixture(scope="module")
def setup(spark):
    images_fp = footprints.with_footprint(datagen.images_df(spark, 200)).cache()
    aoi_pdf = datagen.aoi_pdf(25)
    oracle = spatial_join.spatial_join_oracle(
        images_fp.select("image_id", "minx", "miny", "maxx", "maxy").toPandas(), aoi_pdf
    )
    return images_fp, aoi_pdf, oracle


def test_oracle_nontrivial(setup):
    _, aoi_pdf, oracle = setup
    assert len(oracle) >= 15  # fixtures must make the join non-degenerate
    # the giant skew AOI must match multiple images
    giant = [p for p in oracle if p[1] == "aoi-0000"]
    assert len(giant) >= 3


def test_broadcast_join_matches_oracle(spark, setup):
    images_fp, aoi_pdf, oracle = setup
    got = spatial_join.broadcast_spatial_join(images_fp, aoi_pdf).collect()
    assert {(r.image_id, r.aoi_id) for r in got} == oracle
    assert len(got) == len(oracle)  # no duplicate pairs


def test_broadcast_join_plan_has_no_shuffle(spark, setup):
    images_fp, aoi_pdf, _ = setup
    plan = spatial_join.broadcast_spatial_join(images_fp, aoi_pdf)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map-side join


def test_broadcast_join_extra_cols(spark, setup):
    images_fp, aoi_pdf, oracle = setup
    got = spatial_join.broadcast_spatial_join(images_fp, aoi_pdf, extra_cols=("caption", "w")).collect()
    caps = {r.image_id: r.caption for r in got}
    for iid, cap in caps.items():
        i = int(iid.split("-")[1])
        assert cap == f"synthetic scene {i} tile test"


@pytest.mark.parametrize(
    "res,n_salts,transport",
    [(5, 1, "broadcast"), (5, 4, "broadcast"), (7, 4, "auto"), (5, 4, "rows"), (7, 1, "rows")],
)
def test_partitioned_join_matches_oracle(spark, setup, res, n_salts, transport):
    images_fp, aoi_pdf, oracle = setup
    aois = datagen.aoi_df(spark, 25)
    got = spatial_join.partitioned_spatial_join(
        images_fp, aois, res=res, n_salts=n_salts, geom_transport=transport
    ).collect()
    assert {(r.image_id, r.aoi_id) for r in got} == oracle
    assert len(got) == len(oracle)
