INSERT DATA { <urn:s3> <urn:p> "z" }
