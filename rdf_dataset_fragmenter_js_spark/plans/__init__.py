"""Pipeline plans: testdata-derived quad relations and the JSON pipeline
spec compiler (the reference's componentsjs config equivalent)."""
