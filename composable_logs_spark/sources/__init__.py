from .github import github_repo_artifact_zips

__all__ = ["github_repo_artifact_zips"]
