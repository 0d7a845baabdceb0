from .kpi import (
    budget_revenue_relationship,
    build_genre_summary,
    build_movie_facts,
    build_movie_genre_fact,
    clean_movies,
    country_popularity,
    films_per_year,
    runtime_rating_relationship,
)

__all__ = [
    "budget_revenue_relationship",
    "build_genre_summary",
    "build_movie_facts",
    "build_movie_genre_fact",
    "clean_movies",
    "country_popularity",
    "films_per_year",
    "runtime_rating_relationship",
]
