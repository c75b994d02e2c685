from composable_logs_spark.orchestrator.env_attrs import github_env_attributes


def test_github_env_harvest():
    env = {
        "GITHUB_REPOSITORY": "me/repo",
        "GITHUB_RUN_ID": "123",
        "GITHUB_SHA": "abc",
        "GITHUB_TOKEN": "supersecret",   # never harvested
        "GITHUB_EVENT_NAME": "push",
        "UNRELATED": "x",
        "GITHUB_BASE_REF": "",           # empty -> dropped
    }
    attrs = github_env_attributes(env)
    assert attrs == {
        "workflow.github.repository": "me/repo",
        "workflow.github.run_id": "123",
        "workflow.github.sha": "abc",
        "workflow.github.event_name": "push",
    }
    assert not any("token" in k for k in attrs)
