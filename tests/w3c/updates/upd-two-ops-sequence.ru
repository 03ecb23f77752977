INSERT DATA { <urn:a1> <urn:p> "1" } ; DELETE DATA { <urn:s3> <urn:p> "z" }
