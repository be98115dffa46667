"""CLI — ``drune-spark run|create|update|test|init`` (SURVEY §2.10 O7).

The reference's click UX (reference: cli/main.py:28-89, docs/cli.md:1-42)
on the Gen-2 project machinery: commands operate on a project directory
with a ``drune.yml`` and a pipelines folder.
"""

from __future__ import annotations

import os

import click

from drune_spark.pipeline import Project


class _FriendlyGroup(click.Group):
    """Surface expected failures as one-line errors, not tracebacks."""

    def invoke(self, ctx):
        try:
            return super().invoke(ctx)
        except click.ClickException:
            raise
        except (FileNotFoundError, ValueError, KeyError) as e:
            raise click.ClickException(str(e)) from e


@click.group(cls=_FriendlyGroup)
def cli() -> None:
    """drune_spark — declarative Spark pipelines."""


@cli.command()
@click.argument("pipeline_name")
@click.option("--project", "-p", default=".", help="project directory")
@click.option("--profile", default=None, help="config profile overlay")
@click.option("--stop-at", default=None, help="run up to this step, then stop")
def run(pipeline_name: str, project: str, profile: str | None,
        stop_at: str | None) -> None:
    """Execute a pipeline: read -> schema -> constraints -> steps -> write."""
    proj = Project(project, profile=profile)
    pipe = proj.pipeline(pipeline_name)
    pipe.read()
    pipe.run(stop_at=stop_at)
    if stop_at is None:
        pipe.write()
    click.echo(f"pipeline '{pipeline_name}' completed")


@cli.command()
@click.argument("pipeline_name")
@click.option("--project", "-p", default=".")
@click.option("--profile", default=None)
def create(pipeline_name: str, project: str, profile: str | None) -> None:
    """Create the pipeline's target table from its declared schema."""
    from drune_spark.catalog.ddl import create_table

    proj = Project(project, profile=profile)
    pipe = proj.pipeline(pipeline_name)
    if pipe.model.target is None:
        raise click.ClickException("pipeline has no target")
    create_table(proj.spark, pipe.model.target)
    click.echo(f"created {pipe.model.target.table_name}")


@cli.command()
@click.argument("pipeline_name")
@click.option("--project", "-p", default=".")
@click.option("--profile", default=None)
def update(pipeline_name: str, project: str, profile: str | None) -> None:
    """Evolve the live table to match the declared schema (ADD COLUMNS)."""
    from drune_spark.catalog.ddl import update_table

    proj = Project(project, profile=profile)
    pipe = proj.pipeline(pipeline_name)
    if pipe.model.target is None:
        raise click.ClickException("pipeline has no target")
    stmts = update_table(proj.spark, pipe.model.target)
    click.echo("\n".join(stmts) if stmts else "schema up to date")


@cli.command()
@click.argument("pipeline_name")
@click.option("--project", "-p", default=".")
@click.option("--profile", default=None)
def test(pipeline_name: str, project: str, profile: str | None) -> None:
    """Golden-test mode: run on test source data, diff vs expected
    (volatile columns dropped, exceptAll both ways)."""
    proj = Project(project, profile=profile)
    pipe = proj.pipeline(pipeline_name)
    tb = pipe.model.test
    if tb is None or not tb.expected:
        raise click.ClickException("pipeline has no test: block")
    pipe.read(src_paths=tb.source_data or None)
    pipe.run()
    expected = proj.spark.read.parquet(tb.expected) if "/" in tb.expected \
        else proj.spark.read.table(tb.expected)
    pipe.golden_test(expected)
    click.echo("golden test passed")


@cli.command()
@click.argument("project_dir")
def init(project_dir: str) -> None:
    """Scaffold a new project: drune.yml + pipelines/."""
    os.makedirs(os.path.join(project_dir, "pipelines"), exist_ok=True)
    cfg = os.path.join(project_dir, "drune.yml")
    if os.path.exists(cfg):
        raise click.ClickException(f"{cfg} already exists")
    with open(cfg, "w") as fh:
        fh.write(
            "name: my_project\n"
            "defaults:\n"
            "  engine:\n"
            "    name: spark\n"
            "    options: {}\n"
            "  paths:\n"
            "    pipelines: pipelines\n"
        )
    click.echo(f"initialized {project_dir}")


if __name__ == "__main__":
    cli()
