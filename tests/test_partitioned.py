

def test_empty_input_list_raises(ray_session):
    import pytest

    from kg_gen_ray.pipelines.partitioned import partition_inputs
    with pytest.raises(ValueError, match="no input files"):
        partition_inputs([], 4)
